package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2) re-expressed
  * Spark-first; `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible query (same column names/rounding on both sides) —
  * 122 of 123 entries, including the elections (vincenty replayed as a
  * recursive CTE — q40 plus its 1-in-50 sampled twin q118, which keeps
  * the chain hash-checkable at organic sf1), every LSH/trained-index
  * pipeline (through q119's SemDeDup over the trained IVF cells and
  * q120's Bloom-bitset decontamination), geohash, lang-ID,
  * the pivot/rollup/unpivot reshaping surface (q83/q84/q86), the
  * per-source KL mixture diagnostic (q85), the portable Count-Min /
  * weighted-sampling pair (q87/q88), the passage-dedup / TF-IDF
  * pair (q89/q90), the retrieval stack (q94 BM25, q99 hybrid RRF), and
  * the curation-policy trio (q97 canonical keep, q98 perplexity
  * buckets, q95 cluster topics). The one omitted key (q48
  * native sketches) is rows-only by nature — its internals are
  * implementation-defined — and is audited by its exact twin q80 and the
  * portable deterministic sketch q82.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The §3.1 StreamingAppV3 pipeline restated: filter → per-key grouped
    * point history → dedup+cap → best-location election.
    */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.defs("q40_best_location")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      GeoQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ GeoQueries.oracles
}
