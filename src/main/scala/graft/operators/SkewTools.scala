package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot grouping/join keys (SURVEY.md
  * "Optimize for scale": salting + AQE are the two levers; AQE handles
  * sort-merge-join skew automatically, salting handles aggregation and
  * broadcast-side skew that AQE can't split).
  *
  * Two-phase salted aggregation: spray each hot key across `salts`
  * sub-keys (deterministic hash of a spread column — NOT random, so
  * retries/recomputation stay consistent), partially aggregate per
  * (key, salt), then finish per key. Both phases are hash aggregates with
  * map-side combine; the first shuffle's hottest reducer shrinks by ~salts×.
  */
object SkewTools {

  /** Salt column: deterministic spread of rows across `salts` buckets. */
  def salt(spread: Column, salts: Int): Column =
    pmod(hash(spread), lit(salts))

  /** groupBy(key).count() with a salted first phase. */
  def saltedCount(df: DataFrame, key: Column, spread: Column,
                  salts: Int): DataFrame =
    df.groupBy(key.as("key"), salt(spread, salts).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum("_partial").as("n"))

  /** groupBy(key).agg(sum(valueCol)) with a salted first phase. */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column, spread: Column,
                salts: Int): DataFrame =
    df.groupBy(key.as("key"), salt(spread, salts).as("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col("key"))
      .agg(sum("_partial").as("total"))

  /** Salted broadcast-skew join: replicate the small side `salts`× with an
    * explicit salt column, salt the big side deterministically, equi-join
    * on (key, salt). Use when one join key dominates and even a broadcast
    * join's single-task build or a shuffle join's single reducer chokes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spread: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(spread, salts))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(broadcast(replicatedSmall), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Bucketed co-located join setup: write both fact tables bucketed (and
    * sorted) on the join key with the same bucket count, so every later
    * equi-join on that key is shuffle-free — each task zips bucket i with
    * bucket i. This is the pre-partitioning lever for repeated 100 TB
    * joins (amortize ONE shuffle at write time across every downstream
    * join); `BucketingSpec` proves the join plan has no Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, sortCols: String*): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key, sortCols: _*)
      .saveAsTable(table)
}
