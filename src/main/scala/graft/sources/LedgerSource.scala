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

  // Nullability is part of the contract: the broker-assigned columns
  // (topic/partition/ledger_id/entry_id/publish_us) and the payload bytes
  // are never null by construction — declaring it lets the planner drop
  // the IsNotNull guards it otherwise wraps around every filter and join
  // key on this source. `key` IS nullable (a comma-less entry line has no
  // key; NULL-key rows route by hash on the write path).
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("ledger_id", LongType, nullable = false),
    StructField("entry_id", LongType, nullable = false),
    StructField("key", StringType),
    StructField("value", BinaryType, nullable = false),
    StructField("publish_us", LongType, nullable = false)))

  case class LedgerInfo(ledgerId: Long, entries: Long)

  /** Resume position within a partition: next entry to read. */
  case class Cursor(ledgerId: Long, entryId: Long)

  /** Topic path option → local Path. The session catalog hands DDL-created
    * tables their path back as a file: URI; Paths.get would treat that as
    * a relative name with a colon and silently list nothing.
    */
  def toLocalPath(p: String): Path =
    if (p.startsWith("file:")) Paths.get(java.net.URI.create(p))
    else Paths.get(p)

  /** List partition indices under a topic root (sorted).
    *
    * Files.list holds an OPEN DIRECTORY FD until the stream is closed —
    * and this runs on every latestOffset()/metrics() tick per topic, so an
    * unclosed stream leaks the whole fd table over a long-lived stream
    * (the 200-batch soak died on exactly that: "Too many open files" after
    * ~20 min of batches + concurrent maintenance listing).
    */
  def listPartitions(root: Path): Seq[Int] = {
    if (!Files.isDirectory(root)) return Nil
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("partition-"))
      .map(_.getFileName.toString.stripPrefix("partition-").toInt)
      .toSeq.sorted
    finally s.close()
  }

  /** List ledgers (sorted, including empties) for a partition dir. */
  def listLedgers(partitionDir: Path): Seq[LedgerInfo] = {
    if (!Files.isDirectory(partitionDir)) return Nil
    val stream = Files.list(partitionDir)
    val paths =
      try stream.iterator().asScala
        .filter(_.getFileName.toString.matches("ledger-\\d+\\.log"))
        .toSeq
      finally stream.close()
    pruneCountCache(partitionDir, paths)
    paths.map { p =>
        val id = p.getFileName.toString.stripPrefix("ledger-").stripSuffix(".log").toLong
        val n = countLines(p)
        LedgerInfo(id, n)
      }
      .sortBy(_.ledgerId)
  }

  /** Entry counts cached by (size, mtime): the driver calls listLedgers on
    * every latestOffset()/metrics() tick, and re-reading every segment's
    * full bytes each tick made the driver loop O(data) per batch. With the
    * cache it is O(partitions + ledgers) stat calls — the reference gets
    * the same numbers from broker metadata. Append-only segments change
    * (size, mtime) on every append, so a hit is always current; one entry
    * per path, replaced in place, so the cache cannot grow unboundedly.
    */
  private val lineCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()

  /** Drop cache entries for segments no longer present in `partitionDir`
    * (deleted/compacted segments, removed topics): without eviction a
    * long-running driver leaks one tuple per segment ever seen. Called from
    * listLedgers, which already holds the fresh directory listing, so this
    * costs no extra IO.
    */
  private def pruneCountCache(partitionDir: Path, live: Seq[Path]): Unit = {
    val dirPrefix = partitionDir.toAbsolutePath.toString + java.io.File.separator
    val liveKeys = live.map(_.toAbsolutePath.toString).toSet
    val it = lineCountCache.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k.startsWith(dirPrefix) && !liveKeys.contains(k)) it.remove()
    }
  }

  /** Test hook: number of full-file count scans actually performed. */
  val countScans = new java.util.concurrent.atomic.AtomicLong(0L)

  def countLines(p: Path): Long = {
    val size = Files.size(p)
    val mtime = Files.getLastModifiedTime(p).toMillis
    val key = p.toAbsolutePath.toString
    val hit = lineCountCache.get(key)
    if (hit != null && hit._1 == size && hit._2 == mtime) hit._3
    else {
      val n = scanLineCount(p)
      lineCountCache.put(key, (size, mtime, n))
      n
    }
  }

  private def scanLineCount(p: Path): Long = {
    countScans.incrementAndGet()
    val in = new java.io.BufferedInputStream(Files.newInputStream(p), 1 << 16)
    try {
      var n = 0L
      var last = -1
      var b = in.read()
      if (b == -1) return 0L
      while (b != -1) {
        if (b == '\n') n += 1
        last = b
        b = in.read()
      }
      if (last != '\n') n + 1 else n
    } finally in.close()
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

  /** Partition set a v1 pushed filter restricts `partition` to, when the
    * filter is EXACTLY a partition-dir predicate (equality / IN / null
    * tests on the partition column). Only these are accepted for pushdown:
    * a `partition-<p>` dir contains precisely the rows with partition = p,
    * so pruning dirs by an equality/IN set is exact and the predicate
    * needs no post-scan re-evaluation. Anything else (ranges, Or-trees,
    * other columns) stays in the plan untouched.
    */
  def partitionSetFromFilter(f: org.apache.spark.sql.sources.Filter): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo("partition", v: Number) => Some(Set(v.intValue()))
      case EqualNullSafe("partition", v: Number) => Some(Set(v.intValue()))
      case In("partition", vs) =>
        Some(vs.iterator.collect { case n: Number => n.intValue() }.toSet)
      // partition is non-nullable: IS NULL selects nothing, IS NOT NULL all
      case IsNull("partition") => Some(Set.empty[Int])
      case _ => None
    }
  }

  /** Is `f` a publish_us range predicate the scan can turn into a
    * metadata seek? (The write path assigns publish_us = ledger_id·10⁶ +
    * entry_id, so time bounds map to cursor bounds — see
    * [[trimToPublishBounds]].) These are pushed as PRUNING bounds only:
    * they stay residual in the plan, so Spark re-applies the predicate —
    * which also keeps LIMIT/OFFSET and aggregate pushdown from composing
    * through them (Spark only offers those over fully-pushed filters).
    */
  def isPublishRangeFilter(f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case GreaterThan("publish_us", _: Number) => true
      case GreaterThanOrEqual("publish_us", _: Number) => true
      case LessThan("publish_us", _: Number) => true
      case LessThanOrEqual("publish_us", _: Number) => true
      case EqualTo("publish_us", _: Number) => true
      case _ => false
    }
  }

  /** [lo, hi) publish_us window implied by a CONJUNCTION of pushed range
    * filters (None = unbounded on that side). +1 adjustments saturate at
    * Long.MaxValue — saturation can only widen the window, and the
    * predicate stays residual, so conservative inclusion is safe. */
  def publishBounds(filters: Seq[org.apache.spark.sql.sources.Filter])
      : (Option[Long], Option[Long]) = {
    import org.apache.spark.sql.sources._
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def addLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def addHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    def sat(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    filters.foreach {
      case GreaterThan("publish_us", v: Number) => addLo(sat(v.longValue()))
      case GreaterThanOrEqual("publish_us", v: Number) => addLo(v.longValue())
      case LessThan("publish_us", v: Number) => addHi(v.longValue())
      case LessThanOrEqual("publish_us", v: Number) => addHi(sat(v.longValue()))
      case EqualTo("publish_us", v: Number) =>
        addLo(v.longValue()); addHi(sat(v.longValue()))
      case _ => ()
    }
    (lo, hi)
  }

  /** Trim a partition's [from, to) cursor window to the entries that can
    * satisfy publish_us ∈ [lo, hi) — the time-index seek: publish_us =
    * ledger_id·10⁶ + entry_id, so a ledger covers the publish window
    * [id·10⁶, id·10⁶ + entries) and both trim points come from METADATA
    * alone (ledger ids + cached entry counts — no segment bytes read).
    * Sound unconditionally: the prefix excluded by the lo-trim has
    * publish < lo and the suffix excluded by the hi-trim has publish ≥ hi
    * by construction, whatever the entry counts; exact at both ends for
    * segments under 10⁶ entries (the write path's roll-over invariant) —
    * interior entries of a pathological over-long segment are kept
    * conservatively and cleaned by the residual predicate. */
  def trimToPublishBounds(ledgers: Seq[LedgerInfo], from: Cursor, to: Cursor,
      lo: Option[Long], hi: Option[Long]): (Cursor, Cursor) = {
    def leq(a: Cursor, b: Cursor): Boolean = a.ledgerId < b.ledgerId ||
      (a.ledgerId == b.ledgerId && a.entryId <= b.entryId)
    var f = from
    var t = to
    lo.foreach { l =>
      // first cursor whose publish_us can reach l
      val c = ledgers.find(li => li.ledgerId * 1000000L + li.entries > l)
        .fold(t)(li => Cursor(li.ledgerId,
          math.min(li.entries, math.max(0L, l - li.ledgerId * 1000000L))))
      if (!leq(c, f)) f = c
    }
    hi.foreach { h =>
      // exclusive end: inside the last ledger whose window starts below h
      val c = ledgers.filter(_.ledgerId * 1000000L < h).lastOption
        .fold(f)(li => Cursor(li.ledgerId,
          math.min(li.entries, math.max(0L, h - li.ledgerId * 1000000L))))
      if (!leq(t, c)) t = c
    }
    if (leq(f, t)) (f, t) else (f, f)
  }

  /** Intersect the pushed-filter publish window with the reader-option
    * window ([startPublishUs, endPublishUs) — exclusive end, matching
    * the filter form): lo sides max, hi sides min. The option side is a
    * HARD read bound (the Kafka startingTimestamp analogue), enforced by
    * the same exact metadata trim as the filter side. */
  def mergedPublishBounds(options: Map[String, String],
      pushed: (Option[Long], Option[Long])): (Option[Long], Option[Long]) = {
    val oLo = options.get("startpublishus").map(_.toLong)
    val oHi = options.get("endpublishus").map(_.toLong)
    ((pushed._1 ++ oLo).reduceOption(_ max _),
      (pushed._2 ++ oHi).reduceOption(_ min _))
  }

  /** Bytes on disk for a partition's segment files (metadata-only). */
  def partitionBytes(dir: Path, ledgers: Seq[LedgerInfo]): Long =
    ledgers.map { l =>
      try Files.size(dir.resolve(s"ledger-${l.ledgerId}.log"))
      catch { case _: Throwable => 0L }
    }.sum

  /** Test hook: the partition indices the LAST batch planning for each
    * topic path actually planned splits for — how the pruning specs
    * observe that static/runtime partition filters reached the source
    * (planInputPartitions runs again after a runtime filter lands, so the
    * final recorded value reflects the pruned set).
    */
  val lastPlannedPartitions =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Int]]()

  /** Test hook: the per-partition [from, to) cursor ranges the LAST batch
    * planning planned — how the time-pruning specs observe that
    * publish_us bounds became a metadata seek, not a full read. */
  val lastPlannedRanges =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Cursor, Cursor)]]()

  /** Stable pinning: partition idx mod sorted host list (reference
    * SparkPulsarRDD.getPreferredLocations:66-97 — deterministic across
    * batches so per-executor consumer/page caches stay hot).
    */
  def pinTo(sortedHosts: Seq[String], partition: Int): Array[String] =
    if (sortedHosts.isEmpty) Array.empty
    else Array(sortedHosts(partition % sortedHosts.size))

  /** Live executor locations in Spark's "executor_<host>_<id>" task-location
    * form, sorted by numeric executor id (reference
    * SparkPulsarRDD.getPreferredLocations pins ExecutorCacheTaskLocations
    * sorted by executorId — on hosts running several executors, consumer/
    * page-cache affinity is per-executor, and a host-only pin diverges from
    * the reference's mapping). Driver excluded (pinning a partition to the
    * driver would fall back to ANY locality and shift the modulo mapping
    * for every other partition); in local mode the driver IS the only
    * executor, so fall back to it rather than none. Empty when no session
    * (pure-metadata tests) — locality is a hint, never a must.
    */
  def executorLocations(): Seq[String] =
    try {
      val ids = org.apache.spark.SparkEnv.get.blockManager.master
        .getMemoryStatus.keys.toSeq
      val execs = ids.filter(_.executorId != "driver")
      val chosen = if (execs.nonEmpty) execs else ids
      chosen
        .sortBy(e => (try BigInt(e.executorId) catch {
          case _: Throwable => BigInt(Long.MaxValue)
        }, e.executorId))
        .map(e => s"executor_${e.host}_${e.executorId}")
    } catch { case _: Throwable => Nil }

  // -------------------------------------------------------- offset (JSON)

  /** {"0": [ledgerId, entryId], "1": [...]} — minimal hand-rolled JSON so
    * no extra deps; format is stable for checkpoint recovery.
    */
  /** Driver-side status snapshot of a topic as a LocalRelation — backs the
    * `graft_ledger_status(path)` SQL table function (GraftExtensions): the
    * pulsar-admin topics-stats / kafka-consumer-groups --describe analogue.
    * Metadata only: dir listing, cached entry counts, file sizes.
    */
  def statusRelation(path: String)
      : org.apache.spark.sql.catalyst.plans.logical.LocalRelation = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val root = toLocalPath(path)
    val out = Seq(
      AttributeReference("partition", IntegerType, nullable = false)(),
      AttributeReference("segments", IntegerType, nullable = false)(),
      AttributeReference("first_ledger", LongType, nullable = false)(),
      AttributeReference("last_ledger", LongType, nullable = false)(),
      AttributeReference("entries", LongType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)())
    val rows = listPartitions(root).map { p =>
      val dir = root.resolve(s"partition-$p")
      val ledgers = listLedgers(dir)
      val bytes = ledgers.map { l =>
        try Files.size(dir.resolve(s"ledger-${l.ledgerId}.log"))
        catch { case _: Throwable => 0L }
      }.sum
      InternalRow(p, ledgers.size,
        ledgers.headOption.map(_.ledgerId).getOrElse(0L),
        ledgers.lastOption.map(_.ledgerId).getOrElse(0L),
        ledgers.map(_.entries).sum, bytes)
    }
    LocalRelation(out, rows, isStreaming = false)
  }

  /** Consumer-lag snapshot: per-partition backlog of a topic relative to
    * a checkpoint offsets JSON — backs `graft_ledger_lag(path, offsets)`,
    * the kafka-consumer-groups --describe lag column. Same gap-walking
    * backlog math the admission control uses; a stale cursor (before the
    * retained log) degrades to the full log exactly like recovery does.
    */
  def lagRelation(path: String, offsetsJson: String)
      : org.apache.spark.sql.catalyst.plans.logical.LocalRelation = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val root = toLocalPath(path)
    val cursors = LedgerOffset.parse(offsetsJson).cursors
    val out = Seq(
      AttributeReference("partition", IntegerType, nullable = false)(),
      AttributeReference("cursor_ledger", LongType, nullable = false)(),
      AttributeReference("cursor_entry", LongType, nullable = false)(),
      AttributeReference("end_ledger", LongType, nullable = false)(),
      AttributeReference("end_entry", LongType, nullable = false)(),
      AttributeReference("lag", LongType, nullable = false)())
    val rows = listPartitions(root).map { p =>
      val ledgers = listLedgers(root.resolve(s"partition-$p"))
      val c = cursors.getOrElse(p,
        Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
      val end = ledgers.lastOption.map(l => Cursor(l.ledgerId, l.entries))
        .getOrElse(Cursor(0L, 0L))
      InternalRow(p, c.ledgerId, c.entryId, end.ledgerId, end.entryId,
        backlog(ledgers, c))
    }
    LocalRelation(out, rows, isStreaming = false)
  }

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

/** Reader-option validation, secret redaction, and the payload-schema
  * option (reference: PulsarProvider.validateReaderOptions:65-98 fails fast
  * on unknown/invalid options; PulsarConfigUpdater.scala:12-64 redacts
  * auth params from every log line; SparkPulsarPartition.scala:14-51
  * carries Schema[T] to executors for in-source decode). Round 1's
  * provider accepted any option silently — the classic trap where a typo'd
  * `maxRatePerPartitoin` falls back to defaults without a word.
  */
object LedgerOptions {
  import org.apache.spark.sql.types._

  private def posNum(v: String): Option[String] =
    try { if (v.toDouble > 0) None else Some("must be > 0") }
    catch { case _: NumberFormatException => Some("must be a number") }
  private def nonNegNum(v: String): Option[String] =
    try { if (v.toDouble >= 0) None else Some("must be >= 0") }
    catch { case _: NumberFormatException => Some("must be a number") }

  /** Types the in-source JSON decoder supports. */
  val SupportedJsonTypes: Set[DataType] =
    Set(StringType, IntegerType, LongType, DoubleType, BooleanType)

  private def schemaErr(v: String): Option[String] =
    try {
      val st = StructType.fromDDL(v)
      val bad = st.fields.filterNot(f => SupportedJsonTypes.contains(f.dataType))
      val clash = st.fieldNames.map(_.toLowerCase)
        .intersect(LedgerSource.Schema.fieldNames.map(_.toLowerCase))
      if (bad.nonEmpty)
        Some(s"unsupported field type(s) ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}; " +
          s"supported: ${SupportedJsonTypes.map(_.simpleString).toSeq.sorted.mkString(", ")}")
      else if (clash.nonEmpty)
        Some(s"field name(s) ${clash.mkString(", ")} collide with the source's base columns")
      else None
    } catch { case e: Exception => Some(s"not a valid DDL schema (${e.getMessage})") }

  /** Known option -> value validator (None = ok, Some(msg) = invalid). */
  val Known: Map[String, String => Option[String]] = Map(
    "path" -> (v => if (v == null || v.trim.isEmpty) Some("must be a non-empty directory path") else None),
    "maxrateperpartition" -> posNum,
    "minrateperpartition" -> nonNegNum,
    "avgmsgsperentry" -> posNum,
    "maxbyterateperpartition" -> posNum,
    "batchintervalms" -> posNum,
    "estimatedrate" -> posNum,
    "format" -> (v => if (Set("binary", "json").contains(v.toLowerCase)) None
      else Some("must be 'binary' or 'json'")),
    "jsonschema" -> schemaErr,
    // bounded batch reads: explicit [start, end) cursors in the offset-JSON
    // format ({"0":[ledgerId,entryId],...})
    "startoffsets" -> offsetErr,
    "endoffsets" -> offsetErr,
    // time-based positions (the Kafka startingTimestamp / consumer
    // seek-by-time analogue): [startPublishUs, endPublishUs) resolved to
    // cursors from segment metadata (trimToPublishBounds); streams accept
    // only the start side, and each side is exclusive with its cursor
    // twin above
    "startpublishus" -> nonNegNum,
    "endpublishus" -> nonNegNum,
    // write path: bucket count for key-hash routing of NULL partitions
    "writepartitions" -> (v =>
      try { if (v.toInt > 0) None else Some("must be > 0") }
      catch { case _: NumberFormatException => Some("must be an integer") }),
    "authtoken" -> (_ => None),
    // connection-auth hook (LedgerAuth.scala): built-in alias or class name
    "authprovider" -> nonEmpty,
    "oauth2.issuerurl" -> nonEmpty,
    "oauth2.clientid" -> nonEmpty,
    "oauth2.clientsecret" -> nonEmpty,
    "oauth2.audience" -> nonEmpty)

  private def nonEmpty(v: String): Option[String] =
    if (v == null || v.trim.isEmpty) Some("must be non-empty") else None

  private def offsetErr(v: String): Option[String] =
    try { LedgerSource.LedgerOffset.parse(v); None }
    catch { case _: Exception =>
      Some("""must be offset JSON like {"0":[ledgerId,entryId]}""") }

  /** Options whose values must never reach logs or error messages. */
  val Secrets: Set[String] = Set("authtoken", "oauth2.clientsecret")

  /** Table properties Spark's session catalog itself injects for
    * DDL-created tables (CREATE TABLE ... USING graft-ledger) and
    * options the streaming engine adds to every sink (checkpoint
    * location) — engine metadata, not reader options; never validated
    * as user input.
    */
  private val EngineInjected =
    Set("location", "owner", "provider", "external", "comment",
      "checkpointlocation", "queryname")

  /** Fail-fast validation; returns the lowercase-keyed option map. */
  def validate(opts: Map[String, String]): Map[String, String] = {
    val norm = opts.map { case (k, v) => k.toLowerCase -> v } -- EngineInjected
    val unknown = norm.keys.filterNot(Known.contains).toSeq.sorted
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"graft-ledger: unknown option(s): ${unknown.mkString(", ")}. " +
          s"Supported options: ${Known.keys.toSeq.sorted.mkString(", ")}")
    if (!norm.contains("path"))
      throw new IllegalArgumentException("graft-ledger: option 'path' is required")
    for ((k, v) <- norm; err <- Known(k)(v))
      throw new IllegalArgumentException(
        s"graft-ledger: invalid value for option '$k'" +
          (if (Secrets(k)) "" else s" = '$v'") + s": $err")
    if (norm.get("format").exists(_.equalsIgnoreCase("json")) && !norm.contains("jsonschema"))
      throw new IllegalArgumentException(
        "graft-ledger: format=json requires the 'jsonSchema' option (DDL, e.g. \"name STRING, qty INT\")")
    if (norm.contains("jsonschema") && !norm.get("format").exists(_.equalsIgnoreCase("json")))
      throw new IllegalArgumentException(
        "graft-ledger: 'jsonSchema' is only valid with format=json")
    // auth-hook cross-field rules (LedgerAuth.scala): required inputs per
    // built-in provider, and no orphaned provider-specific options
    val oauthKeys = Seq("oauth2.issuerurl", "oauth2.clientid", "oauth2.clientsecret")
    if (norm.get("authprovider").contains("oauth2")) {
      val missing = oauthKeys.filterNot(norm.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"graft-ledger: authProvider=oauth2 requires option(s): ${missing.mkString(", ")}")
    } else if (norm.keys.exists(_.startsWith("oauth2.")))
      throw new IllegalArgumentException(
        "graft-ledger: oauth2.* options are only valid with authProvider=oauth2")
    if (norm.get("authprovider").contains("token") && !norm.contains("authtoken"))
      throw new IllegalArgumentException(
        "graft-ledger: authProvider=token requires the 'authToken' option")
    // one start position, one end position — a cursor bound and a time
    // bound on the same side would silently shadow each other
    if (norm.contains("startpublishus") && norm.contains("startoffsets"))
      throw new IllegalArgumentException(
        "graft-ledger: choose ONE start position: 'startOffsets' (cursors) or 'startPublishUs' (time)")
    if (norm.contains("endpublishus") && norm.contains("endoffsets"))
      throw new IllegalArgumentException(
        "graft-ledger: choose ONE end position: 'endOffsets' (cursors) or 'endPublishUs' (time)")
    norm
  }

  /** Secrets masked for any rendering (table name, logs, errors). */
  def redact(opts: Map[String, String]): Map[String, String] =
    opts.map { case (k, v) => k -> (if (Secrets(k.toLowerCase)) "***" else v) }

  /** Typed payload fields decoded in-source, when format=json. */
  def payloadSchema(norm: Map[String, String]): Option[StructType] =
    if (norm.get("format").exists(_.equalsIgnoreCase("json")))
      Some(StructType.fromDDL(norm("jsonschema")))
    else None

  /** Full output schema: base columns ++ decoded payload fields. */
  def fullSchema(norm: Map[String, String]): StructType =
    payloadSchema(norm).fold(LedgerSource.Schema)(ps =>
      StructType(LedgerSource.Schema.fields ++ ps.fields))
}

class LedgerSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ledger"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerOptions.fullSchema(LedgerOptions.validate(options.asScala.toMap))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val norm = LedgerOptions.validate(properties.asScala.toMap)
    new LedgerTable(norm("path"), norm)
  }
}

class LedgerTable(path: String, options: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  /** Connection-auth params from the configured provider (LedgerAuth
    * hook). Resolved eagerly: a bad provider class or malformed auth
    * option fails the query at table resolution, not on an executor
    * mid-batch. Raw values live only here — never in toString/plans.
    */
  private[graft] val connectionConf: Map[String, String] =
    LedgerAuth.clientConf(options)
  override def name(): String = s"graft-ledger($path)"
  // any rendering of the option map (logs, plans, errors) goes through
  // redact — auth secrets never appear in the clear
  override def toString: String =
    s"graft-ledger($path, ${LedgerOptions.redact(options - "path").toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", ")})"
  override def schema(): StructType = LedgerOptions.fullSchema(options)
  // ACCEPT_ANY_SCHEMA: append frames resolve columns BY NAME (key/value/
  // partition; everything else is log-assigned), so a bare (key, value)
  // frame appends without having to fabricate the broker-side columns
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new LedgerScanBuilder(path, LedgerOptions.validate(options ++ opts.asScala))
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new LedgerWriteBuilder(path, info,
      LedgerOptions.validate(options ++ info.options().asScala))
}

/** Column pruning pushed into the source (S7 for the connector itself):
  * a projection like select(key) reads only that column — and with
  * format=json, only the REQUIRED payload fields are decoded per entry,
  * so a 3-column projection over a 50-field payload schema does 3 field
  * lookups, not 50.
  */
class LedgerScanBuilder(path: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownOffset
    with SupportsPushDownAggregates {
  private var required: StructType = LedgerOptions.fullSchema(options)
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  /** COUNT(*) — optionally GROUP BY partition — answers from segment
    * METADATA: entry counts are already cached by (size, mtime) for the
    * driver's admission loop, so `SELECT count(*) FROM topic` is a
    * directory walk, not a 100 TB read. COMPLETE pushdown (Spark keeps no
    * aggregate operator); only offered for CountStar over the bare scan —
    * Spark's rule guarantees every filter below the aggregate was itself
    * fully pushed, so the accepted partition-pruning filters compose and
    * anything else blocks the push. GROUP BY partition emits one row per
    * NON-EMPTY partition (a group only exists where rows do).
    */
  private var pushedAgg: Option[LedgerAggPush] = None
  private def classifyAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[LedgerAggPush] = {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val counts = agg.aggregateExpressions.length
    val allCountStar =
      counts > 0 && agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    val gb = agg.groupByExpressions.map {
      case f: org.apache.spark.sql.connector.expressions.NamedReference
          if f.fieldNames.sameElements(Array("partition")) => true
      case _ => false
    }
    if (!allCountStar) None
    else if (gb.isEmpty) Some(LedgerAggPush(groupByPartition = false, counts))
    else if (gb.length == 1 && gb.head) Some(LedgerAggPush(groupByPartition = true, counts))
    else None
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    classifyAgg(agg).isDefined
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    classifyAgg(agg) match {
      case some @ Some(_) => pushedAgg = some; true
      case None => false
    }
  }
  /** LIMIT/OFFSET push all the way down, FULLY: offset planning is
    * driver-side cursor arithmetic over cached entry counts, so the scan
    * allocates per-partition [from, to) ranges that skip exactly `offset`
    * entries and stop at exactly `limit` — a `.limit(100)` over a 100 TB
    * topic plans ~100 entries of read, not the topic (Spark removes its
    * own Limit/Offset operators: isPartiallyPushed = false). Spark's
    * pushdown rule only offers these when every operator below the limit
    * was itself fully pushed, so residual filters can't reorder through.
    * Row order is the log's own (partition asc, then ledger/entry) —
    * deterministic, which is more than LIMIT without ORDER BY promises.
    */
  // limit/offset never co-push with an aggregate (Spark's rule runs
  // aggregates first and a Limit between blocks them, but guard anyway:
  // a limit silently ignored by the agg scan would be a wrong answer)
  override def pushLimit(l: Int): Boolean =
    if (pushedAgg.isDefined) false else { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = false
  override def pushOffset(o: Int): Boolean =
    if (pushedAgg.isDefined) false else { offset = Some(o); true }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Static partition pruning (the 100 TB point of a partitioned log:
    * `WHERE partition = 3` must read one directory, not the topic).
    * Accepted filters are EXACT on partition dirs (see
    * partitionSetFromFilter), so they are consumed here — nothing returned
    * for Spark to re-evaluate — and surface in `.explain` as
    * PushedFilters. publish_us range predicates are pushed as PRUNING
    * BOUNDS (the time-index seek: trimToPublishBounds) but returned as
    * residual — Spark re-applies them, which both covers the pathological
    * over-long-segment case and blocks LIMIT/OFFSET/aggregate pushdown
    * from composing through an un-consumed filter. Everything else is
    * left in the plan untouched.
    */
  private var tsBounds: (Option[Long], Option[Long]) = (None, None)
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (accepted, rest) =
      filters.partition(f => LedgerSource.partitionSetFromFilter(f).isDefined)
    val tsF = rest.filter(LedgerSource.isPublishRangeFilter)
    tsBounds = LedgerSource.publishBounds(tsF.toSeq)
    pushed = accepted ++ tsF
    rest
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  private def staticAllowed: Option[Set[Int]] = {
    val sets = pushed.flatMap(LedgerSource.partitionSetFromFilter)
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }
  override def build(): Scan = pushedAgg match {
    case Some(a) => new LedgerAggScan(path, options, a, staticAllowed)
    case None =>
      new LedgerScan(path, options, required, staticAllowed, limit, offset,
        tsBounds)
  }
}

/** An accepted COUNT(*) pushdown: group by partition or global, `counts`
  * CountStar columns (SELECT count(*), count(*) repeats the column).
  */
case class LedgerAggPush(groupByPartition: Boolean, counts: Int)

/** The metadata-answered aggregate scan: one driver-planned split whose
  * reader emits the precomputed (partition?, count...) rows. Counts honor
  * statically pruned partitions and explicit [start,end) offset ranges —
  * the same figures the full scan would have produced, at directory-walk
  * cost.
  */
class LedgerAggScan(path: String, options: Map[String, String],
    agg: LedgerAggPush, staticAllowed: Option[Set[Int]]) extends Scan {
  import LedgerSource._
  override def readSchema(): StructType = {
    val counts = (1 to agg.counts).map(i =>
      StructField(s"count_$i", LongType, nullable = false))
    if (agg.groupByPartition)
      StructType(StructField("partition", IntegerType, nullable = false) +: counts)
    else StructType(counts)
  }
  override def description(): String =
    s"graft-ledger($path) PushedAggregates: [COUNT(*)]" +
      (if (agg.groupByPartition) " GroupBy: [partition]" else "") +
      staticAllowed.fold("")(s =>
        s" PushedPartitions: ${s.toSeq.sorted.mkString("[", ",", "]")}")
  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val root = toLocalPath(path)
      val startOpt = options.get("startoffsets").map(LedgerOffset.parse(_).cursors)
      val endOpt = options.get("endoffsets").map(LedgerOffset.parse(_).cursors)
      // startPublishUs/endPublishUs are HARD read bounds even with no
      // Catalyst filter in the plan (publish_us FILTERS stay residual, so
      // Spark never pushes an aggregate over them — the option path is the
      // only way a time window reaches this scan). Counts must match the
      // rows the trimmed row scan returns: same mergedPublishBounds window,
      // same metadata trim as LedgerBatchRead.
      val bounds = mergedPublishBounds(options, (None, None))
      val all = listPartitions(root)
      val parts = staticAllowed.fold(all)(s => all.filter(s))
      LedgerSource.lastPlannedPartitions.put(path, parts)
      val perPart = parts.map { p =>
        val ledgers = listLedgers(root.resolve(s"partition-$p"))
        val from0 = startOpt.flatMap(_.get(p)).getOrElse(
          Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
        val to0 = endOpt.flatMap(_.get(p)).getOrElse(
          ledgers.lastOption.map(l => Cursor(l.ledgerId, l.entries))
            .getOrElse(Cursor(0L, 0L)))
        val (from, to) =
          trimToPublishBounds(ledgers, from0, to0, bounds._1, bounds._2)
        p -> math.max(0L, entriesBetween(ledgers, from, to))
      }
      val rows: Seq[(Int, Long)] =
        if (agg.groupByPartition) perPart.filter(_._2 > 0) // groups need rows
        else Seq((-1, perPart.map(_._2).sum)) // COUNT(*) is 1 row even on empty
      Array(LedgerAggInputPartition(rows, agg))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new LedgerAggReaderFactory
  }
}

case class LedgerAggInputPartition(rows: Seq[(Int, Long)], agg: LedgerAggPush)
  extends InputPartition

class LedgerAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[LedgerAggInputPartition]
    new PartitionReader[InternalRow] {
      private val it = ap.rows.iterator
      private var cur: (Int, Long) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = {
        val counts = Seq.fill(ap.agg.counts)(cur._2: Any)
        if (ap.agg.groupByPartition) InternalRow.fromSeq(cur._1 +: counts)
        else InternalRow.fromSeq(counts)
      }
      override def close(): Unit = ()
    }
  }
}

class LedgerScan(path: String, options: Map[String, String],
                 required: StructType,
                 staticAllowed: Option[Set[Int]] = None,
                 pushedLimit: Option[Int] = None,
                 pushedOffset: Option[Int] = None,
                 tsBounds: (Option[Long], Option[Long]) = (None, None))
    extends Scan
    with SupportsReportPartitioning with SupportsReportOrdering
    with SupportsReportStatistics with SupportsRuntimeFiltering {
  import LedgerSource.{Cursor, LedgerOffset, entriesBetween, listLedgers, partitionBytes, trimToPublishBounds}
  // pushed publish_us filters ∩ the startPublishUs/endPublishUs reader
  // options — one effective window drives the trim, the stats, and the
  // planned splits
  private val effBounds: (Option[Long], Option[Long]) =
    LedgerSource.mergedPublishBounds(options, tsBounds)
  override def readSchema(): StructType = required
  // surfaces static pruning in `.explain` (BatchScan node description)
  override def description(): String =
    s"graft-ledger($path)" + staticAllowed.fold("")(s =>
      s" PushedPartitions: ${s.toSeq.sorted.mkString("[", ",", "]")}") +
      pushedOffset.fold("")(o => s" PushedOffset: $o") +
      pushedLimit.fold("")(l => s" PushedLimit: $l") +
      (if (effBounds._1.isDefined || effBounds._2.isDefined)
        s" PushedPublishRange: [${effBounds._1.getOrElse("")}," +
          s"${effBounds._2.getOrElse("")})"
       else "")
  // the stream honors the static partition set too: accepted pushed
  // filters were removed from the plan as exact, so every path this scan
  // can execute through must enforce them. tsBounds deliberately do NOT
  // reach the stream: they were returned residual (Spark re-applies the
  // predicate), and a stream's admission window is cursor-driven anyway —
  // the bounds are a batch seek optimization only.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LedgerMicroBatchStream(path, options, required, staticAllowed)
  /** ONE partition-dir listing per scan: the partition count
    * outputPartitioning reports and the splits the batch actually plans
    * must come from the same snapshot — two independent listings under
    * concurrent appends could disagree within a single query (reported
    * n=4 vs 5 planned splits).
    *
    * Lifetime note: the snapshot lives as long as this Scan object. A
    * fresh query plans a fresh Scan (new ScanBuilder → build()), so it
    * sees partitions appended since; but RE-EXECUTING one cached/reused
    * Dataset reuses its physical plan and therefore this snapshot — by
    * design, since a repeated execution of the same plan re-reading a
    * DIFFERENT partition layout is exactly the reported-vs-planned
    * inconsistency this snapshot exists to prevent. Readers wanting fresh
    * partitions re-plan (re-build the DataFrame), same as any DSv2 source.
    */
  private lazy val partitionSnapshot: Seq[Int] = {
    val all = LedgerSource.listPartitions(LedgerSource.toLocalPath(path))
    staticAllowed.fold(all)(s => all.filter(s))
  }

  /** Join-driven runtime partition pruning (the DSv2 dynamic-partition-
    * pruning hook): when this scan joins a dimension on `partition` and
    * the dim side carries a selective filter, Spark hands the surviving
    * join-key values here as an In filter and re-plans the batch's input
    * partitions — at 100 TB, a lookup joining 3 of 10k log partitions
    * reads 3 directories instead of the topic. Set before toBatch() is
    * re-invoked by BatchScanExec; unparseable filters are ignored (runtime
    * filtering is an optimization — the join still applies the predicate).
    */
  @volatile private var runtimeAllowed: Option[Set[Int]] = None
  /** Runtime filtering composes UNSOUNDLY with a fully-pushed LIMIT/
    * OFFSET: Spark already removed its Limit/Offset operators
    * (isPartiallyPushed = false), so a runtime filter arriving later
    * (filter() + a re-planned toBatch()) would make the scan emit the
    * first `limit` entries OF THE PRUNED PARTITION SET — not the pruned
    * subset of the original `limit`-entry prefix the deleted Limit
    * promised. A limit-then-join against a filtered dimension would
    * silently return different rows. So with a pushed limit/offset this
    * scan offers NO filter attributes (and ignores any filter handed to
    * it, as belt): DPP is only an optimization — the join still applies
    * its predicate to the correct prefix.
    */
  private def runtimeFilteringSound: Boolean =
    pushedLimit.isEmpty && pushedOffset.isEmpty
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (runtimeFilteringSound && required.fieldNames.contains("partition"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("partition"))
    else Array.empty
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    if (runtimeFilteringSound) {
      val sets = filters.flatMap(LedgerSource.partitionSetFromFilter)
      if (sets.nonEmpty) runtimeAllowed = Some(sets.reduce(_ intersect _))
    }
  }

  private def effectivePartitions: Seq[Int] =
    runtimeAllowed.fold(partitionSnapshot)(s => partitionSnapshot.filter(s))

  // bounded batch read over an explicit [startOffsets, endOffsets) range —
  // the reference's createRDD-over-OffsetRange path (S2), used by the
  // consistency checker to re-read exactly what a stream committed
  override def toBatch(): Batch =
    new LedgerBatchRead(path, options, required, Some(effectivePartitions),
      pushedLimit, pushedOffset, effBounds)

  /** Metadata-only size/row estimates (segment byte sizes + cached entry
    * counts, same figures the status TVF reports) so Catalyst can SIZE
    * this source: without them a DSv2 relation defaults to
    * `spark.sql.defaultSizeInBytes` (= never broadcastable), and a small
    * lookup topic joined against a 100 TB fact would shuffle both sides.
    * Honors static pruning and explicit [start,end) offset ranges — bytes
    * for a sub-range are prorated from the partition's on-disk total.
    */
  override def estimateStatistics(): Statistics = {
    val root = LedgerSource.toLocalPath(path)
    val startOpt = options.get("startoffsets").map(LedgerOffset.parse(_).cursors)
    val endOpt = options.get("endoffsets").map(LedgerOffset.parse(_).cursors)
    var rows = 0L
    var bytes = 0L
    partitionSnapshot.foreach { p =>
      val dir = root.resolve(s"partition-$p")
      val ledgers = listLedgers(dir)
      val total = ledgers.map(_.entries).sum
      val from0 = startOpt.flatMap(_.get(p)).getOrElse(
        Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
      val to0 = endOpt.flatMap(_.get(p)).getOrElse(
        ledgers.lastOption.map(l => Cursor(l.ledgerId, l.entries))
          .getOrElse(Cursor(0L, 0L)))
      // publish_us bounds narrow the estimate the same way they narrow
      // the planned splits — a time-sliced lookup sizes (and broadcasts)
      // like the slice it reads, not like the whole topic
      val (from, to) =
        trimToPublishBounds(ledgers, from0, to0, effBounds._1, effBounds._2)
      val range = math.max(0L, entriesBetween(ledgers, from, to))
      val dirBytes = partitionBytes(dir, ledgers)
      rows += range
      bytes += (if (total <= 0L) 0L
                else math.ceil(dirBytes.toDouble * range / total).toLong)
    }
    // a FULLY pushed offset/limit removes Spark's own operators, so the
    // relation's stats must reflect the post-limit size — a .limit(10)
    // lookup side would otherwise be sized at the whole topic and never
    // broadcast. Pushed LIMIT is a prefix length INCLUDING the offset
    // (Spark pushes l + o for Limit(l, Offset(o))): rows = [O, min(n, L))
    val afterLimit = pushedLimit.fold(rows)(l => math.min(rows, l.toLong))
    val finalRows = math.max(0L,
      afterLimit - pushedOffset.map(_.toLong).getOrElse(0L))
    val finalBytes =
      if (rows <= 0L) 0L
      else math.ceil(bytes.toDouble * finalRows / rows).toLong
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(finalBytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(finalRows)
    }
  }

  /** The scan's data IS clustered by the log partition (one InputPartition
    * per `partition-<i>` dir, keyed via `HasPartitionKey`), so report it:
    * with `spark.sql.sources.v2.bucketing.enabled`, a `GROUP BY partition`
    * aggregation (the per-partition lag/throughput rollups a log operator
    * runs constantly) and storage-partitioned joins against another scan
    * of the same layout need NO Exchange — at 100 TB that's the difference
    * between a metadata statement and reshuffling the whole log. Reported
    * only when the `partition` column survives pruning (the key must
    * resolve against the scan output) and the layout is non-empty.
    */
  override def outputPartitioning(): partitioning.Partitioning = {
    val n = partitionSnapshot.size
    if (n > 0 && required.fieldNames.contains("partition"))
      new partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("partition")), n)
    else new partitioning.UnknownPartitioning(0)
  }

  /** Each split reads one log partition strictly in (ledger_id, entry_id)
    * order — the log IS sorted — so report it and let the planner drop
    * Sort nodes: a per-partition window (latest-entry dedup, offset-gap
    * audit) or a sorted-merge against another log scan runs sort-free.
    * `partition` leads the ordering (constant within a split, so
    * trivially satisfied) to line up with windows PARTITION BY partition
    * ORDER BY ledger_id, entry_id. Only reported when all three columns
    * survive pruning — a reported ordering must resolve against the
    * scan's output schema.
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val cols = Seq("partition", "ledger_id", "entry_id")
    if (cols.forall(required.fieldNames.contains))
      cols.map(c => org.apache.spark.sql.connector.expressions.Expressions
        .sort(org.apache.spark.sql.connector.expressions.Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
        .toArray
    else Array.empty
  }
}

/** One-shot bounded read: [startOffsets, endOffsets) per partition,
  * defaulting to the full log (first ledger to current end). Same bounded
  * readers and pinning as the streaming path.
  */
class LedgerBatchRead(path: String, options: Map[String, String],
    required: StructType,
    partitionSnapshot: Option[Seq[Int]] = None,
    pushedLimit: Option[Int] = None,
    pushedOffset: Option[Int] = None,
    tsBounds: (Option[Long], Option[Long]) = (None, None)) extends Batch {
  import LedgerSource._

  private val root = toLocalPath(path)

  // reuse the owning scan's listing when given, so planned splits agree
  // with the partitioning that scan reported (see LedgerScan)
  private def partitions(): Seq[Int] =
    partitionSnapshot.getOrElse(listPartitions(root))

  override def planInputPartitions(): Array[InputPartition] = {
    val startOpt = options.get("startoffsets").map(LedgerOffset.parse(_).cursors)
    val endOpt = options.get("endoffsets").map(LedgerOffset.parse(_).cursors)
    val locations = executorLocations()
    val parts = partitions()
    LedgerSource.lastPlannedPartitions.put(path, parts)
    // Global OFFSET/LIMIT allocation — pure cursor arithmetic over cached
    // entry counts, so a limit-100 read of a billion-entry topic plans
    // ~100 entries. Spark's convention for Limit(l, Offset(o, scan)): the
    // pushed LIMIT is the PREFIX length INCLUDING the skipped rows
    // (l + o), and OFFSET skips within that prefix — the planned rows are
    // stream positions [O, L). With nothing pushed the window is
    // [0, ∞) and this reduces to the full [from, to) plan.
    val limitPos = pushedLimit.map(_.toLong).getOrElse(Long.MaxValue)
    val offsetPos = pushedOffset.map(_.toLong).getOrElse(0L)
    var consumed = 0L // stream position: entries of earlier partitions
    val out = Seq.newBuilder[InputPartition]
    val ranges = Seq.newBuilder[(Int, Cursor, Cursor)]
    parts.foreach { p =>
      if (consumed < limitPos) {
        val ledgers = listLedgers(root.resolve(s"partition-$p"))
        val from0 = startOpt.flatMap(_.get(p)).getOrElse(
          Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
        val to0 = endOpt.flatMap(_.get(p)).getOrElse(
          ledgers.lastOption.map(l => Cursor(l.ledgerId, l.entries))
            .getOrElse(Cursor(0L, 0L)))
        // the time-index seek: publish_us bounds narrow [from, to) from
        // metadata before anything is allocated — trim-then-allocate is
        // also the correct filter-below-limit order, though a residual
        // time filter blocks limit pushdown so the two never co-occur
        val (from, to) =
          trimToPublishBounds(ledgers, from0, to0, tsBounds._1, tsBounds._2)
        val avail = math.max(0L, entriesBetween(ledgers, from, to))
        val winStart = math.max(consumed, offsetPos)
        val winEnd = math.min(consumed + avail, limitPos)
        if (winEnd > winStart) {
          val skip = winStart - consumed
          val take = winEnd - winStart
          val from2 = if (skip == 0) from else advance(ledgers, from, skip)
          val end = if (skip + take == avail) to else advance(ledgers, from2, take)
          out += LedgerInputPartition(path, p, from2.ledgerId, from2.entryId,
            end.ledgerId, end.entryId, pinTo(locations, p))
          ranges += ((p, from2, end))
        }
        consumed += avail
      }
    }
    LedgerSource.lastPlannedRanges.put(path, ranges.result())
    out.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerReaderFactory(required, None)
}

/** The micro-batch stream: admission control lives in latestOffset —
  * the Structured-Streaming analogue of the reference's backpressure
  * (SupportsAdmissionControl replaces the DStream RateController).
  */
class LedgerMicroBatchStream(path: String, options: Map[String, String],
    required: StructType,
    allowedPartitions: Option[Set[Int]] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics {
  import LedgerSource._

  /** Parse, never cast: on restart with an uncommitted batch in the offset
    * log, the engine REPLAYS that batch handing the source a
    * SerializedOffset (the raw checkpoint JSON) instead of the source's
    * own type — `deserializeOffset` is not on that path. A blind cast
    * dies with ClassCastException on exactly the kill-between-offset-and-
    * commit recovery the checkpoint exists for (caught by the 208-batch
    * kill/resume soak, `Dev soak`).
    */
  private def asLedgerOffset(o: Offset): LedgerOffset = o match {
    case l: LedgerOffset => l
    case other => LedgerOffset.parse(other.json)
  }

  /** Per-batch source metrics surfaced in StreamingQueryProgress
    * (replaces the reference's per-topic accumulator/Codahale subsystem,
    * PulsarMetricType.scala:11-113: msgs/bytes per batch, rates, decode
    * failures — engine-native observability). Entry/byte counts come from
    * offset metadata (cached counts + file sizes); decode failures from an
    * executor-side accumulator.
    */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val consumed = if (latestConsumedOffset.isPresent)
      asLedgerOffset(latestConsumedOffset.get()).cursors
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
      "numPartitions" -> parts.size.toString,
      "batchEntries" -> lastBatchEntries.toString,
      "batchBytes" -> lastBatchBytes.toString,
      "entriesPerSecond" ->
        f"${lastBatchEntries * 1000.0 / math.max(1L, batchIntervalMs)}%.1f",
      "decodeFailures" ->
        Option(decodeFailures).map(_.value.toString).getOrElse("0")
    ).asJava
  }

  // ---- per-batch figures for metrics(): set on the driver when the batch
  // is planned; decode failures accumulate from executors
  @volatile private var lastBatchEntries = 0L
  @volatile private var lastBatchBytes = 0L
  // consumed frontier of the last PLANNED batch — what the metrics-system
  // backlog gauges measure against (metrics() gets the engine-supplied
  // consumed offset per progress tick; a registry gauge has no argument)
  @volatile private var lastPlannedEnd: Map[Int, Cursor] = Map.empty
  private val decodeFailures: org.apache.spark.util.LongAccumulator =
    try {
      org.apache.spark.sql.SparkSession.active.sparkContext
        .longAccumulator(s"graft-ledger($path).decodeFailures")
    } catch { case _: Throwable => null }

  // metrics-SYSTEM registration (reference parity: the per-topic Codahale
  // Source, PulsarMetricsSource.scala:7-30) — the same figures metrics()
  // reports per batch, exported as live gauges any configured sink
  // scrapes. Registration is idempotent per (SparkEnv, topic) and a
  // missing SparkEnv is a no-op: metrics never fail a stream.
  locally {
    def backlogs(): Seq[Long] = {
      val consumed = lastPlannedEnd
      partitions().map { p =>
        val ledgers = listLedgers(partitionDir(p))
        val c = consumed.getOrElse(p,
          Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L))
        backlog(ledgers, c)
      }
    }
    org.apache.spark.metrics.source.GraftLedgerMetricsSource.register(path, Map(
      "totalBacklog" -> (() => backlogs().sum),
      "maxPartitionBacklog" ->
        (() => { val b = backlogs(); if (b.isEmpty) 0L else b.max }),
      "numPartitions" -> (() => partitions().size.toLong),
      "batchEntries" -> (() => lastBatchEntries),
      "batchBytes" -> (() => lastBatchBytes),
      "decodeFailures" ->
        (() => Option(decodeFailures).map(_.value.longValue).getOrElse(0L))))
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

  private val root = toLocalPath(path)
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
    val all = listPartitions(root)
    allowedPartitions.fold(all)(s => all.filter(s))
  }

  // streams have no end: a configured end bound is a misconfiguration, not
  // an option to ignore (the batch path honors it; silence here would be
  // the same trap LedgerOptions.validate exists to kill)
  require(!options.contains("endoffsets"),
    "graft-ledger: 'endOffsets' is only valid for batch reads (spark.read); a stream has no end")
  require(!options.contains("endpublishus"),
    "graft-ledger: 'endPublishUs' is only valid for batch reads (spark.read); a stream has no end")

  // explicit start position for NEW checkpoints (the reference's
  // external-offset resume made explicit; Kafka startingOffsets analogue).
  // Partitions absent from the JSON start at their first ledger.
  private val startOverride: Map[Int, Cursor] =
    options.get("startoffsets")
      .map(LedgerOffset.parse(_).cursors).getOrElse(Map.empty)

  // time-based start for NEW checkpoints (Kafka startingTimestamp /
  // consumer seek-by-time analogue): the first cursor whose publish_us
  // can reach the bound, resolved per partition from segment metadata —
  // exclusive with startOffsets (LedgerOptions.validate). Checkpointed
  // streams resume from their committed cursors as always; this only
  // positions a FRESH query.
  private val startTime: Option[Long] =
    options.get("startpublishus").map(_.toLong)

  private def partitionDir(p: Int): Path = root.resolve(s"partition-$p")

  override def initialOffset(): Offset =
    LedgerOffset(partitions().map { p =>
      val ledgers = listLedgers(partitionDir(p))
      val first = Cursor(ledgers.headOption.map(_.ledgerId).getOrElse(0L), 0L)
      val default = startTime.fold(first) { t =>
        val end = ledgers.lastOption.map(l => Cursor(l.ledgerId, l.entries))
          .getOrElse(first)
        trimToPublishBounds(ledgers, first, end, Some(t), None)._1
      }
      p -> startOverride.getOrElse(p, default)
    }.toMap)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = asLedgerOffset(start).cursors
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
    val s = asLedgerOffset(start).cursors
    val e = asLedgerOffset(end).cursors
    // stable partition→executor pinning (idx mod executor-id-sorted
    // location list) so the same partition lands on the same executor
    // across batches — consumer/page-cache reuse, reference
    // SparkPulsarRDD.getPreferredLocations:66-97
    val locations = LedgerSource.executorLocations()
    var batchEntries = 0L
    var batchBytes = 0L
    val planned = e.keys.toSeq.sorted.flatMap { p =>
      val from = s.getOrElse(p, Cursor(0L, 0L))
      val to = e(p)
      if (from == to) None
      else {
        val ledgers = listLedgers(partitionDir(p))
        val n = entriesBetween(ledgers, from, to)
        val totalEntries = ledgers.map(_.entries).sum
        val totalBytes = ledgers.map(l =>
          try Files.size(partitionDir(p).resolve(s"ledger-${l.ledgerId}.log"))
          catch { case _: Throwable => 0L }).sum
        batchEntries += n
        if (totalEntries > 0) batchBytes += (totalBytes.toDouble / totalEntries * n).toLong
        Some(LedgerInputPartition(path, p, from.ledgerId, from.entryId,
          to.ledgerId, to.entryId, LedgerSource.pinTo(locations, p)): InputPartition)
      }
    }.toArray
    lastBatchEntries = batchEntries
    lastBatchBytes = batchBytes
    lastPlannedEnd = e
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerReaderFactory(required, Option(decodeFailures))

  override def deserializeOffset(json: String): Offset = LedgerOffset.parse(json)
  override def commit(end: Offset): Unit = () // files are immutable; the
  // checkpointed offset IS the commit (replaces cursor reset / cumulative
  // ack, PulsarStreamUtils.scala:114-155)
  override def stop(): Unit = ()
}

case class LedgerInputPartition(path: String, partition: Int,
    startLedger: Long, startEntry: Long, endLedger: Long, endEntry: Long,
    preferred: Array[String] = Array.empty)
  extends InputPartition with HasPartitionKey {
  override def preferredLocations(): Array[String] = preferred
  // one split per log partition → the split key IS the partition id;
  // lets BatchScanExec honor LedgerScan.outputPartitioning (key-grouped)
  override def partitionKey(): InternalRow = InternalRow(partition)
}

class LedgerReaderFactory(
    readSchema: StructType = LedgerSource.Schema,
    decodeFailures: Option[org.apache.spark.util.LongAccumulator] = None)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerInputPartition]
    new LedgerPartitionReader(p, readSchema, decodeFailures)
  }
}

/** Bounded reader: iterate entries from (startLedger, startEntry)
  * inclusive to (endLedger, endEntry) exclusive, skipping gap/empty
  * ledgers (reference PulsarBoundedConsumer.internalIterator:37-65).
  * Emits exactly the pruned readSchema columns. Payload fields (any
  * readSchema field outside the base schema) decode from the JSON payload
  * executor-side — the reference's Schema[T]-per-message decode
  * (SparkPulsarPartition.scala:14-51) — and ONLY the required fields are
  * looked up; malformed payloads yield null typed columns and bump the
  * decode-failure accumulator (PERMISSIVE semantics, a poison entry never
  * kills the stream).
  */
class LedgerPartitionReader(p: LedgerInputPartition,
    readSchema: StructType = LedgerSource.Schema,
    decodeFailures: Option[org.apache.spark.util.LongAccumulator] = None)
    extends PartitionReader[InternalRow] {
  import LedgerSource._

  private val dir = toLocalPath(p.path).resolve(s"partition-${p.partition}")
  private val ledgers = listLedgers(dir)
    .filter(l => l.ledgerId >= p.startLedger && l.ledgerId <= p.endLedger)
  private val topic = toLocalPath(p.path).getFileName.toString

  private val entryIter: Iterator[(Long, Long, String)] =
    ledgers.iterator.flatMap { l =>
      val from = if (l.ledgerId == p.startLedger) p.startEntry else 0L
      // clamp to what the segment actually holds: streaming cursors are
      // always in-range (advance() produces them), but batch reads accept
      // user-supplied endOffsets JSON — a generous entryId means "to the
      // end", not an IndexOutOfBounds crash
      val until = math.min(
        if (l.ledgerId == p.endLedger) p.endEntry else l.entries, l.entries)
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

  // Jackson ships in Spark's runtime jars — no extra dependency
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private val baseNames = LedgerSource.Schema.fieldNames.toSet
  // only the payload fields the projection actually needs are decoded
  private val payloadFields: Array[StructField] =
    readSchema.fields.filterNot(f => baseNames.contains(f.name))
  private val topicUtf8 = UTF8String.fromString(topic)

  /** Strict per-field decode: a PRESENT field of the wrong JSON kind is a
    * decode failure (null + counter), never a silent Jackson coercion to
    * 0/false — `{"qty":"oops"}` with `qty INT` must not flow downstream
    * as qty=0.
    */
  private def decodeJson(payload: String): Array[Any] =
    try {
      val node = mapper.readTree(payload)
      var badField = false
      val out = payloadFields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case StringType =>
            UTF8String.fromString(if (v.isTextual) v.asText else v.toString)
          case IntegerType =>
            if (v.isNumber) v.asInt() else { badField = true; null }
          case LongType =>
            if (v.isNumber) v.asLong() else { badField = true; null }
          case DoubleType =>
            if (v.isNumber) v.asDouble() else { badField = true; null }
          case BooleanType =>
            if (v.isBoolean) v.asBoolean() else { badField = true; null }
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      }
      if (badField) decodeFailures.foreach(_.add(1L))
      out
    } catch {
      case _: Exception =>
        decodeFailures.foreach(_.add(1L))
        payloadFields.map(_ => null: Any)
    }

  // per-row hot path: opcodes precomputed at construction — no per-field
  // string matching per row
  private val OpTopic = 0; private val OpPartition = 1; private val OpLedger = 2
  private val OpEntry = 3; private val OpKey = 4; private val OpValue = 5
  private val OpPublish = 6; private val OpPayload = 7
  private val fieldOps: Array[Int] = {
    var pf = 0
    readSchema.fields.map { f =>
      f.name match {
        case "topic"      => OpTopic
        case "partition"  => OpPartition
        case "ledger_id"  => OpLedger
        case "entry_id"   => OpEntry
        case "key"        => OpKey
        case "value"      => OpValue
        case "publish_us" => OpPublish
        case _            => val op = OpPayload + pf; pf += 1; op
      }
    }
  }

  override def get(): InternalRow = {
    val (ledgerId, entryId, line) = current
    val (key, payload) = line.indexOf(',') match {
      case -1 => (null, line)
      case i  => (line.substring(0, i), line.substring(i + 1))
    }
    val decoded: Array[Any] =
      if (payloadFields.isEmpty) null else decodeJson(payload)
    val values = new Array[Any](fieldOps.length)
    var i = 0
    while (i < fieldOps.length) {
      values(i) = fieldOps(i) match {
        case OpTopic      => topicUtf8
        case OpPartition  => p.partition
        case OpLedger     => ledgerId
        case OpEntry      => entryId
        case OpKey        => if (key == null) null else UTF8String.fromString(key)
        case OpValue      => payload.getBytes(StandardCharsets.UTF_8)
        case OpPublish    => ledgerId * 1000000L + entryId
        case op           => decoded(op - OpPayload)
      }
      i += 1
    }
    // ownership transfer of the per-call array — no Seq wrap + re-copy
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
