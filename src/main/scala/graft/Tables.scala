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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as long nanos (dynamic SQLConf, safe to set
      // on any session) and derive typed columns in events().
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
  /** events with `ts` as long nanos plus derived `ts_ms` (epoch millis) and
    * `event_ts` (TimestampType, microsecond precision). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integer `div`, NOT `/`: long `/` promotes to double and loses
    // precision at 1e18-scale nanos (off-by-one vs DuckDB's truncation).
    apply(s, d, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
