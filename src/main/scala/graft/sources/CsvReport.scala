package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** K5 CSV report sink (reference spark-jobs AccuracyAnalysis.scala:148-166,
  * GenericEventCount.scala:52-59, FuturePastEvents.scala:87-97): the
  * reference collects results to the driver and hand-writes rows with
  * opencsv; Spark-first the same report is a header'd CSV write.
  *
  * coalesce(1) is deliberate and safe here: a report is a small aggregate
  * by construction (its upstream groupBy stays fully distributed — the
  * coalesce only narrows the final, already-tiny result), and one file
  * with a header is the contract a report consumer expects. Callers with
  * large extracts should write partitioned CSV via df.write.csv directly.
  */
object CsvReport {

  /** Write `report` as a single header'd CSV file under `path`. */
  def write(report: DataFrame, path: String): Unit =
    report.coalesce(1)
      .write.mode("overwrite")
      .option("header", value = true)
      .csv(path)

  /** Read a report back with its exact schema (header'd CSV is stringly;
    * the explicit schema restores the written types, round-trip-exact for
    * the integral/string/decimal columns reports are made of).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", value = true)
      .schema(schema)
      .csv(path)
}
