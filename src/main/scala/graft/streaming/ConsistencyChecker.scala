package graft.streaming

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

/** Source-vs-sink reconciliation (reference:
  * KafkaCassandraConsistencyChecker.scala:120-149 — fetch the committed
  * offset range from ZK, createRDD over it, point-read the Cassandra table
  * per record, collect the misses). Restated Spark-first: the committed
  * range re-reads through the ledger source's bounded batch path
  * (startOffsets/endOffsets), and the per-row point reads + driver collect
  * become one distributed left-anti join against the sink — the miss list
  * stays a DataFrame, so a 100 TB re-check never funnels through the
  * driver; only the (expected-tiny) exception report materializes, capped
  * like the reference's exceptionsLineLimit.
  */
object ConsistencyChecker {

  case class Report(missingCount: Long, checkedSample: Seq[String])

  /** Rows present in the committed source range but absent from the sink.
    *
    * @param decode    source rows → sink-comparable rows (e.g. the payload
    *                  parse the pipeline itself applies)
    * @param keyCols   identity columns compared against the sink
    * @param start/end offset JSON as checkpointed ({"0":[ledger,entry]});
    *                  None = from log start / to current end
    */
  def missingFromSink(spark: SparkSession, topicPath: String,
                      sink: DataFrame, keyCols: Seq[String],
                      decode: DataFrame => DataFrame = identity,
                      start: Option[String] = None,
                      end: Option[String] = None,
                      sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    var r: DataFrameReader = spark.read.format("graft-ledger")
      .option("path", topicPath)
    sourceOptions.foreach { case (k, v) => r = r.option(k, v) }
    start.foreach(s => r = r.option("startOffsets", s))
    end.foreach(e => r = r.option("endOffsets", e))
    decode(r.load())
      .join(sink.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
  }

  /** Bounded report: total miss count + up to `sampleLimit` rendered rows
    * (the reference caps its CSV at exceptionsLineLimit=10000).
    */
  def report(missing: DataFrame, keyCols: Seq[String],
             sampleLimit: Int = 10000): Report = {
    val counted = missing.cache()
    try {
      val n = counted.count()
      val sample = counted.select(keyCols.map(col): _*)
        .limit(sampleLimit).collect().map(_.mkString(",")).toSeq
      Report(n, sample)
    } finally counted.unpersist()
  }
}
