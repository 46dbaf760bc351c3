package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst column pruning and
  * filter pushdown reach the scan. At 100 TB these tables would be
  * partitioned (e.g. lineitem by l_shipdate month); the query code below is
  * partition-agnostic — pruning happens via pushed predicates either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Older testdata generations write events.ts as parquet
      // TIMESTAMP(NANOS), which Spark's vectorized reader rejects unless
      // read as long nanos (dynamic SQLConf, safe to set on any session).
      // Newer generations write TIMESTAMP(MICROS); the conf is then a no-op
      // and events() normalizes on the actual dtype it finds.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events with `ts` normalized to canonical long epoch NANOS regardless of
    * the parquet physical type the driver generated — TIMESTAMP(NANOS) read
    * as long via nanosAsLong, or TIMESTAMP(MICROS) read as
    * Timestamp/TimestampNTZ — plus derived `ts_ms` (epoch millis) and
    * `event_ts` (TimestampType, microsecond precision). Sessions run with
    * timeZone=UTC, so casting NTZ→Timestamp interprets the naive value as
    * UTC, matching DuckDB's `epoch_us(ts)` on the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, d, "events")
    val nanos = raw.schema("ts").dataType match {
      // integer `div`, NOT `/`: long `/` promotes to double and loses
      // precision at 1e18-scale nanos (off-by-one vs DuckDB's truncation).
      case LongType => col("ts")
      case _        => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    raw.withColumn("ts", nanos)
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  // path -> (mtime, rows): keying the VALUE by mtime (not the cache key)
  // means a rewritten part file replaces its stale entry instead of
  // accumulating one entry per (path, mtime) forever in a long-lived JVM.
  private val rowCountCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  /** Recursive data-file listing of a parquet table (file or directory
    * layout, including nested/partitioned subdirectories), sorted by path
    * for deterministic fingerprints. Skips _SUCCESS/_metadata/hidden files.
    */
  private def listParquetFiles(spark: SparkSession, dir: String,
      name: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else {
        val n = st.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          Seq(st)
        else Nil
      }
    walk(fs.getFileStatus(root)).sortBy(_.getPath.toString)
  }

  /** Table row count from parquet FOOTER statistics — a metadata read, not
    * a scan job (df.count() launches a job even for a columnless count
    * unless aggregate pushdown is enabled). Cached per file with mtime
    * invalidation, so sizing decisions like srpBandBits cost nothing per
    * invocation; at 100 TB this is the difference between a driver-side
    * footer read and a driver-blocking cluster job per query build.
    * Recurses into subdirectories, so a partitioned layout counts fully.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    listParquetFiles(spark, dir, name).map { st =>
      val (path, mtime) = (st.getPath.toString, st.getModificationTime)
      rowCountCache.get(path) match {
        case Some((m, n)) if m == mtime => n
        case _ =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
          val n = try rd.getRecordCount finally rd.close()
          rowCountCache.put(path, (mtime, n))
          n
      }
    }.sum
  }

  /** Stable identity of a parquet dataset for artifact caches (trained BPE
    * merge tables, ANN centroids/codebooks): per-part (name, size, mtime)
    * over the recursive listing. A directory entry's own size/mtime is NOT
    * reliable — rewriting a part file in place need not change either — so
    * the fingerprint covers every data file.
    */
  def parquetFingerprint(spark: SparkSession, dir: String, name: String): String =
    listParquetFiles(spark, dir, name)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString(s"$dir/$name.parquet|", ",", "")
}
