package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: the runtime half of the skew story (SkewTools
  * salting is the compile-time half). A join with one hot key must come
  * out of AQE with the skewed partition split (`skew=true` in the final
  * SMJ) — proving the engine's answer to data skew is active, not just
  * configured.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits a skewed join partition at runtime") {
    val prev = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    // shrink thresholds so test-sized skew (100k rows on one key vs 10 on
    // the rest) crosses them; production uses the 256 MiB defaults
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      // key 0 carries 100k rows; keys 1..99 carry 10 each
      val big = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
        .unionByName(spark.range(990).select((col("id") % 99 + 1).as("k"), col("id").as("v")))
      val small = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(small, "k")
      joined.collect() // materialize THIS QueryExecution so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"), s"AQE did not split the skewed join:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
