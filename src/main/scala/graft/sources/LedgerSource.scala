package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DSv2 micro-batch streaming source over a directory of append-only
  * "ledger" segment files — a hermetic emulation of a partitioned log
  * (SURVEY.md §2.11 / §7 Phase 4). The reference's driver-side pipeline —
  * ledger metadata → backlog → backlog-proportional admission → per-
  * partition [start,end] offset ranges → bounded executor reads → commit —
  * is reproduced 1:1 on files so ledger math, rate control and recovery
  * are testable without a broker (reference: PulsarLedger.scala:31-157,
  * PulsarHelper.scala:70-170, DirectSparkPulsarDstream.scala:16-116).
  *
  * Layout: `<path>/partition-<i>/ledger-<id>.log`, one entry per line.
  * Ledger ids may be sparse (gaps) and ledgers may be empty — offset
  * arithmetic must walk gaps exactly like the reference's
  * getNextMessageId/getEndMessageId.
  *
  * Offsets are (ledgerId, entryId) per partition, entryId = NEXT entry to
  * read (exclusive-end / resume position), serialized as JSON. Scale: all
  * driver-side work is O(partitions + ledgers) metadata; data never moves
  * through the driver; each partition is one InputPartition → natural
  * 1-task-per-partition parallelism with executor-side sequential file
  * reads.
  */
object LedgerSource {

  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("ledger_id", LongType),
    StructField("entry_id", LongType),
    StructField("key", StringType),
    StructField("value", BinaryType),
    StructField("publish_us", LongType)))

  case class LedgerInfo(ledgerId: Long, entries: Long)

  /** Resume position within a partition: next entry to read. */
  case class Cursor(ledgerId: Long, entryId: Long)

  /** List ledgers (sorted, including empties) for a partition dir. */
  def listLedgers(partitionDir: Path): Seq[LedgerInfo] = {
    if (!Files.isDirectory(partitionDir)) return Nil
    Files.list(partitionDir).iterator().asScala
      .filter(_.getFileName.toString.matches("ledger-\\d+\\.log"))
      .map { p =>
        val id = p.getFileName.toString.stripPrefix("ledger-").stripSuffix(".log").toLong
        val n = countLines(p)
        LedgerInfo(id, n)
      }
      .toSeq.sortBy(_.ledgerId)
  }

  def countLines(p: Path): Long = {
    val bytes = Files.readAllBytes(p)
    if (bytes.isEmpty) 0L
    else {
      var n = 0L
      bytes.foreach(b => if (b == '\n') n += 1)
      if (bytes.last != '\n') n + 1 else n
    }
  }

  /** Entries remaining at-or-after the cursor (reference computeBacklog,
    * PulsarLedger.scala:47-76 — stale cursors before the first ledger
    * count the full log).
    */
  def backlog(ledgers: Seq[LedgerInfo], cur: Cursor): Long =
    ledgers.map { l =>
      if (l.ledgerId < cur.ledgerId) 0L
      else if (l.ledgerId == cur.ledgerId) math.max(0L, l.entries - cur.entryId)
      else l.entries
    }.sum

  /** Advance a cursor by `n` entries, walking ledger gaps/empties
    * (reference getEndMessageId/getNextMessageId, PulsarLedger.scala:85-157).
    */
  def advance(ledgers: Seq[LedgerInfo], cur: Cursor, n: Long): Cursor = {
    var remaining = n
    var c = cur
    ledgers.foreach { l =>
      if (remaining > 0 && l.ledgerId >= c.ledgerId) {
        val start = if (l.ledgerId == c.ledgerId) c.entryId else 0L
        val avail = math.max(0L, l.entries - start)
        val take = math.min(avail, remaining)
        remaining -= take
        val newEntry = start + take
        c = Cursor(l.ledgerId, newEntry)
      } else if (l.ledgerId > c.ledgerId && remaining > 0) {
        c = Cursor(l.ledgerId, 0L)
      }
    }
    c
  }

  /** Entries in [from, to) across ledgers. */
  def entriesBetween(ledgers: Seq[LedgerInfo], from: Cursor, to: Cursor): Long =
    backlog(ledgers, from) - backlog(ledgers, to)

  /** Stable pinning: partition idx mod sorted host list (reference
    * SparkPulsarRDD.getPreferredLocations:66-97 — deterministic across
    * batches so per-executor consumer/page caches stay hot).
    */
  def pinTo(sortedHosts: Seq[String], partition: Int): Array[String] =
    if (sortedHosts.isEmpty) Array.empty
    else Array(sortedHosts(partition % sortedHosts.size))

  /** Live executor hosts (driver excluded — pinning a partition to the
    * driver's host would fall back to ANY locality and shift the modulo
    * mapping for every other partition), sorted; in local mode the driver
    * IS the only executor, so fall back to it rather than none. Empty when
    * no session (pure-metadata tests) — locality is a hint, never a must.
    */
  def executorHosts(): Seq[String] =
    try {
      val ids = org.apache.spark.SparkEnv.get.blockManager.master
        .getMemoryStatus.keys.toSeq
      val execs = ids.filter(_.executorId != "driver").map(_.host)
      val hosts = if (execs.nonEmpty) execs else ids.map(_.host)
      hosts.distinct.sorted
    } catch { case _: Throwable => Nil }

  // -------------------------------------------------------- offset (JSON)

  /** {"0": [ledgerId, entryId], "1": [...]} — minimal hand-rolled JSON so
    * no extra deps; format is stable for checkpoint recovery.
    */
  case class LedgerOffset(cursors: Map[Int, Cursor]) extends Offset {
    override def json(): String =
      cursors.toSeq.sortBy(_._1).map { case (p, c) =>
        s""""$p":[${c.ledgerId},${c.entryId}]"""
      }.mkString("{", ",", "}")
  }

  object LedgerOffset {
    def parse(s: String): LedgerOffset = {
      val body = s.trim.stripPrefix("{").stripSuffix("}")
      if (body.isEmpty) LedgerOffset(Map.empty)
      else LedgerOffset(body.split("(?<=\\]),").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        val nums = v.trim.stripPrefix("[").stripSuffix("]").split(",")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt ->
          Cursor(nums(0).trim.toLong, nums(1).trim.toLong)
      }.toMap)
    }
  }
}

class LedgerSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ledger"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LedgerTable(properties.get("path"), properties.asScala.toMap)
}

class LedgerTable(path: String, options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-ledger($path)"
  override def schema(): StructType = LedgerSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new LedgerScan(path, options ++ opts.asScala)
}

class LedgerScan(path: String, options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = LedgerSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LedgerMicroBatchStream(path, options)
}

/** The micro-batch stream: admission control lives in latestOffset —
  * the Structured-Streaming analogue of the reference's backpressure
  * (SupportsAdmissionControl replaces the DStream RateController).
  */
class LedgerMicroBatchStream(path: String, options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics {
  import LedgerSource._

  /** Per-batch source metrics surfaced in StreamingQueryProgress
    * (replaces the reference's per-topic accumulator/Codahale subsystem,
    * PulsarMetricType.scala:11-113 — engine-native observability).
    */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val consumed = if (latestConsumedOffset.isPresent)
      latestConsumedOffset.get().asInstanceOf[LedgerOffset].cursors
    else Map.empty[Int, Cursor]
    val parts = partitions()
    val backlogs = parts.map { p =>
      val ledgers = listLedgers(partitionDir(p))
      val c = consumed.getOrElse(p,
        Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
      backlog(ledgers, c)
    }
    Map(
      "totalBacklog" -> backlogs.sum.toString,
      "maxPartitionBacklog" -> (if (backlogs.isEmpty) "0" else backlogs.max.toString),
      "numPartitions" -> parts.size.toString
    ).asJava
  }

  // Trigger.AvailableNow: snapshot the end target once, then keep emitting
  // rate-limited batches until every partition reaches it.
  private var availableNowTarget: Option[LedgerOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(allAvailableOffset())

  override def reportLatestOffset(): Offset = allAvailableOffset()

  private def allAvailableOffset(): LedgerOffset =
    LedgerOffset(partitions().map { p =>
      val ledgers = listLedgers(partitionDir(p))
      val end = ledgers.lastOption
        .map(l => Cursor(l.ledgerId, l.entries))
        .getOrElse(Cursor(0L, 0L))
      p -> end
    }.toMap)

  private val root = Paths.get(path)
  private val maxRate = options.getOrElse("maxrateperpartition", "1000").toDouble
  private val minRate = options.getOrElse("minrateperpartition", "1").toDouble
  private val avgMsgsPerEntry = options.getOrElse("avgmsgsperentry", "1").toDouble
  // reference default 128 MiB/s/partition (PulsarConf.scala:24-28); the
  // per-partition avg entry size comes from the segment files themselves
  private val maxByteRate =
    options.getOrElse("maxbyterateperpartition", "134217728").toDouble
  private val batchIntervalMs = options.getOrElse("batchintervalms", "1000").toLong
  // driver-estimated rate (the PID estimate in the reference); optional
  private val estimatedRate = options.get("estimatedrate").map(_.toLong)

  private def partitions(): Seq[Int] = {
    if (!Files.isDirectory(root)) return Nil
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("partition-"))
      .map(_.getFileName.toString.stripPrefix("partition-").toInt)
      .toSeq.sorted
  }

  private def partitionDir(p: Int): Path = root.resolve(s"partition-$p")

  override def initialOffset(): Offset =
    LedgerOffset(partitions().map { p =>
      val first = listLedgers(partitionDir(p)).headOption
      p -> Cursor(first.map(_.ledgerId).getOrElse(0L), 0L)
    }.toMap)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = start.asInstanceOf[LedgerOffset].cursors
    val parts = partitions()
    val ledgersByPart = parts.map(p => p -> listLedgers(partitionDir(p))).toMap
    val cursors = parts.map { p =>
      val ledgers = ledgersByPart(p)
      val c = cur.getOrElse(p,
        Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
      p -> c
    }.toMap
    val backlogs = parts.map(p => backlog(ledgersByPart(p), cursors(p)))
    // measured avg entry size per partition (bytes on disk / entries) feeds
    // the byte-rate cap — O(ledgers) driver-side metadata only
    val avgEntryBytes = parts.map { p =>
      val dir = partitionDir(p)
      val ledgers = ledgersByPart(p)
      val entries = ledgers.map(_.entries).sum
      if (entries == 0) 1.0
      else ledgers.map(l =>
        try Files.size(dir.resolve(s"ledger-${l.ledgerId}.log")) catch {
          case _: Throwable => 0L
        }).sum.toDouble / entries
    }
    val quotas = RateAllocator.maxEntriesPerPartition(
      estimatedRate, backlogs, batchIntervalMs,
      i => RateAllocator.PartitionConfig(maxRate, minRate, avgMsgsPerEntry,
        maxByteRate, avgEntryBytes(i)))
    LedgerOffset(parts.zip(quotas).map { case (p, q) =>
      // under AvailableNow, never run past the snapshot taken at start
      val cap = availableNowTarget.flatMap(_.cursors.get(p))
        .map(t => math.min(q, entriesBetween(ledgersByPart(p), cursors(p), t)))
        .getOrElse(q)
      p -> advance(ledgersByPart(p), cursors(p), math.max(0L, cap))
    }.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LedgerOffset].cursors
    val e = end.asInstanceOf[LedgerOffset].cursors
    // stable partition→executor pinning (idx mod sorted host list) so the
    // same partition lands on the same executor across batches — consumer/
    // page-cache reuse, reference SparkPulsarRDD.getPreferredLocations:66-97
    val hosts = LedgerSource.executorHosts()
    e.keys.toSeq.sorted.flatMap { p =>
      val from = s.getOrElse(p, Cursor(0L, 0L))
      val to = e(p)
      if (from == to) None
      else Some(LedgerInputPartition(path, p, from.ledgerId, from.entryId,
        to.ledgerId, to.entryId, LedgerSource.pinTo(hosts, p)): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerReaderFactory

  override def deserializeOffset(json: String): Offset = LedgerOffset.parse(json)
  override def commit(end: Offset): Unit = () // files are immutable; the
  // checkpointed offset IS the commit (replaces cursor reset / cumulative
  // ack, PulsarStreamUtils.scala:114-155)
  override def stop(): Unit = ()
}

case class LedgerInputPartition(path: String, partition: Int,
    startLedger: Long, startEntry: Long, endLedger: Long, endEntry: Long,
    preferred: Array[String] = Array.empty)
  extends InputPartition {
  override def preferredLocations(): Array[String] = preferred
}

class LedgerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerInputPartition]
    new LedgerPartitionReader(p)
  }
}

/** Bounded reader: iterate entries from (startLedger, startEntry)
  * inclusive to (endLedger, endEntry) exclusive, skipping gap/empty
  * ledgers (reference PulsarBoundedConsumer.internalIterator:37-65).
  */
class LedgerPartitionReader(p: LedgerInputPartition)
    extends PartitionReader[InternalRow] {
  import LedgerSource._

  private val dir = Paths.get(p.path).resolve(s"partition-${p.partition}")
  private val ledgers = listLedgers(dir)
    .filter(l => l.ledgerId >= p.startLedger && l.ledgerId <= p.endLedger)
  private val topic = Paths.get(p.path).getFileName.toString

  private val entryIter: Iterator[(Long, Long, String)] =
    ledgers.iterator.flatMap { l =>
      val from = if (l.ledgerId == p.startLedger) p.startEntry else 0L
      val until = if (l.ledgerId == p.endLedger) p.endEntry else l.entries
      if (until <= from) Iterator.empty
      else {
        val lines = Files.readAllLines(
          dir.resolve(s"ledger-${l.ledgerId}.log"), StandardCharsets.UTF_8)
        (from until until).iterator.map(i => (l.ledgerId, i, lines.get(i.toInt)))
      }
    }

  private var current: (Long, Long, String) = _

  override def next(): Boolean = {
    if (entryIter.hasNext) { current = entryIter.next(); true } else false
  }

  override def get(): InternalRow = {
    val (ledgerId, entryId, line) = current
    val (key, payload) = line.indexOf(',') match {
      case -1 => (null, line)
      case i  => (line.substring(0, i), line.substring(i + 1))
    }
    InternalRow(
      UTF8String.fromString(topic),
      p.partition,
      ledgerId,
      entryId,
      if (key == null) null else UTF8String.fromString(key),
      payload.getBytes(StandardCharsets.UTF_8),
      ledgerId * 1000000L + entryId)
  }

  override def close(): Unit = ()
}
