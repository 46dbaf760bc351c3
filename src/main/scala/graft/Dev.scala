package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local spot checks while developing. Not part of the
  * driver contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val flagship = SparkEntry.entry(spark)
    flagship.show(5, truncate = false)
    println(s"[dev] entry rows = ${flagship.count()}")
    spark.stop()
  }
}
