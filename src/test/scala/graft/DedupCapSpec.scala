package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupMaintenance, TextQueries}
import graft.functions.TextFunctions

/** The batch dedup build's template-saturation pre-pass (r17 verdict
  * task 1): `spark.graft.dedup.maxBucket` promotes the streaming gate's
  * hot-bucket cap to the BATCH pair-graph build, composed with q27-style
  * exact-duplicate collapse. Both conf directions are pinned:
  *
  *   - cap = 0 (default): the build is bit-equal to the exact jaccard
  *     join — the oracle-checked contract, unchanged;
  *   - cap > 0: declared-lossy, and the loss is CHARACTERIZED on a
  *     planted template corpus — a true pair is dropped exactly when
  *     EVERY band bucket its representatives share is over-cap, and a
  *     pair inside an exact-duplicate group is NEVER dropped (the
  *     collapse recovers it at jac = 1.0 with no candidate join at
  *     all, even under cap = 1 where every colliding bucket is hot).
  */
class DedupCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- planted corpus ----------------------------------------------------
  // A 30-doc TEMPLATE family (one shared 24-word boilerplate + one unique
  // word each — pairwise jaccard 22/24, band keys near-identical, so the
  // family's buckets saturate any small cap), a 4-doc EXACT-duplicate
  // group of the bare template (collapses to one representative), one
  // small control near-dup pair in its own vocabulary (tiny buckets —
  // survives any cap >= 2), and an unrelated singleton.
  private val vocab = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray")
  private def uniq(i: Int) =
    s"zq${(97 + i / 26).toChar}${(97 + i % 26).toChar}"
  private val templateIds = (100L until 130L).toSeq
  private val exactIds = Seq(200L, 201L, 202L, 203L)
  private val docsSeq: Seq[(Long, String)] =
    templateIds.map(i => i -> s"$vocab ${uniq(i.toInt - 100)}") ++
      exactIds.map(_ -> vocab) ++
      Seq(
        300L -> ("panther quartz rhubarb sable timber umber vellum wicker " +
          "yonder zephyr mango nectar"),
        301L -> ("panther quartz rhubarb sable timber umber vellum wicker " +
          "yonder zephyr mango nectar orchid"),
        400L -> "quasar nebula photon gluon entropy vertex axion lepton")

  private def docsDf: DataFrame = {
    import spark.implicits._
    docsSeq.toDF("doc_id", "text")
  }

  private def shingled(df: DataFrame): DataFrame = df
    .select(col("doc_id"), TextFunctions.wordNgramsUdf(3)(col("text"))
      .as("shingles"))
    .filter(size(col("shingles")) > 0)
    .localCheckpoint()

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairJac(df: DataFrame): Map[(Long, Long), Double] =
    df.select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  /** The spec's own exact all-pairs jaccard join (Scala sets — engine-
    * independent), restricted to jac >= 0.5. */
  private lazy val exactPairs: Map[(Long, Long), Double] = {
    val sh = docsSeq.map { case (id, t) =>
      id -> TextFunctions.wordNgramsScala(t, 3).toSet }
      .filter(_._2.nonEmpty).toMap
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.5
    } yield (a, b) -> j).toMap
  }

  test("cap=0 (default) batch build is bit-equal to the exact jaccard join") {
    assert(spark.conf.getOption(TextQueries.DedupMaxBucketConf).isEmpty)
    val sh = shingled(docsDf)
    val banded = TextQueries.bandedOf(sh).localCheckpoint()
    val got = pairJac(TextQueries.lshPairsFromDocs(sh, banded, 0.5))
    assert(got == exactPairs,
      "uncapped LSH build diverged from the exact all-pairs join")
    // the same contract through DedupMaintenance.build with the conf unset
    val g = DedupMaintenance.build(docsDf)
    assert(pairJac(g.pairs) == exactPairs,
      "DedupMaintenance.build (cap off) diverged from the exact join")
  }

  test("a non-binding cap is bit-equal to the uncapped build, jac for jac") {
    val sh = shingled(docsDf)
    val capped = pairJac(TextQueries.lshPairsCappedFromShingled(sh, 1000000, 0.5))
    assert(capped == exactPairs,
      "capped build with a non-binding cap must reproduce the exact join " +
        "(collapse + expansion is lossless; only over-cap buckets drop pairs)")
  }

  test("a binding cap drops EXACTLY the pairs whose every shared rep-level " +
    "bucket is over-cap — and nothing else") {
    val cap = 5
    val sh = shingled(docsDf)
    // spec-side replay of the collapse + banding, straight off the same
    // engine surfaces the build uses
    val shRows = sh.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1).toList)
    val repOf: Map[Long, Long] = {
      val groups = shRows.groupBy(_._2).values
      groups.flatMap { g => val rep = g.map(_._1).min
        g.map(_._1 -> rep) }.toMap
    }
    val reps = repOf.values.toSet
    val repSh = sh.filter(col("doc_id").isin(reps.toSeq: _*))
    val bucketReps: Map[String, Set[Long]] = TextQueries.bandedOf(repSh)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    val hot = bucketReps.filter(_._2.size > cap).keySet
    def survives(a: Long, b: Long): Boolean = {
      val ra = repOf(a); val rb = repOf(b)
      ra == rb || bucketReps.exists { case (bk, members) =>
        !hot.contains(bk) && members.contains(ra) && members.contains(rb) }
    }
    val predicted = exactPairs.filter { case ((a, b), _) => survives(a, b) }
    val got = pairJac(TextQueries.lshPairsCappedFromShingled(sh, cap, 0.5))
    assert(got == predicted,
      "capped build's drop set must be exactly the pairs whose every " +
        "shared rep-level bucket is over-cap")
    val dropped = exactPairs.keySet -- predicted.keySet
    assert(dropped.nonEmpty, "the plant failed to bind: no pair had all " +
      "of its shared buckets over the cap — shrink the cap or grow the family")
    assert(dropped.forall { case (a, b) =>
      (templateIds ++ exactIds).contains(a) && (templateIds ++ exactIds).contains(b) },
      "only template-family pairs may be dropped")
    // the control near-dup pair sits in tiny buckets — never dropped
    assert(got.contains((300L, 301L)), "control pair lost under the cap")
  }

  test("exact-duplicate groups are immune to the cap: cap=1 keeps exactly " +
    "the within-group pairs, at jac = 1.0") {
    val sh = shingled(docsDf)
    // cap = 1: every bucket holding >= 2 reps is hot, so NO rep-level
    // candidate survives — the output must be exactly the exact-group
    // expansion (the q27 composition's floor)
    val got = pairJac(TextQueries.lshPairsCappedFromShingled(sh, 1, 0.5))
    val withinExact = (for {
      a <- exactIds; b <- exactIds if a < b
    } yield (a, b) -> 1.0).toMap
    assert(got == withinExact,
      "cap=1 must keep exactly the exact-duplicate within-group pairs")
  }

  test("capped build through the conf: DedupMaintenance.build routes the " +
    "pair derivation through the pre-pass and matches the direct capped chain") {
    val cap = 5
    spark.conf.set(TextQueries.DedupMaxBucketConf, cap.toString)
    try {
      val g = DedupMaintenance.build(docsDf)
      val direct = pairJac(
        TextQueries.lshPairsCappedFromShingled(shingled(docsDf), cap, 0.5))
      assert(pairJac(g.pairs) == direct,
        "conf-routed build diverged from the direct capped chain")
      // the band table stays FULL (linear-sized; the refresh path's index)
      val bandDocs = g.bands.select("doc_id").distinct().count()
      assert(bandDocs == docsSeq.size.toLong,
        s"capped build must still band every doc for the graph artifact " +
          s"(got $bandDocs of ${docsSeq.size})")
    } finally spark.conf.unset(TextQueries.DedupMaxBucketConf)
  }

  test("capped refresh: persisted pairs are never dropped; delta candidates " +
    "drop only inside over-cap buckets (combined store+delta hotness)") {
    import spark.implicits._
    val cap = 5
    spark.conf.set(TextQueries.DedupMaxBucketConf, cap.toString)
    try {
      val base = DedupMaintenance.build(docsDf)
      val basePairs = pairSet(base.pairs)
      assert(basePairs.contains((300L, 301L)))
      // delta: one fresh template doc (every bucket hot on the combined
      // population → contributes nothing) and one clone of control doc
      // 300 (tiny buckets → its pairs land)
      val delta = Seq(
        500L -> s"$vocab ${uniq(40)}",
        501L -> docsSeq.toMap.apply(300L)).toDF("doc_id", "text")
      val (g2, report) = DedupMaintenance.maintain(base, delta)
      assert(report.mode == "refresh", s"expected the refresh arm, got $report")
      val got = pairSet(g2.pairs)
      assert(basePairs.subsetOf(got),
        "capped refresh dropped a persisted pair — the union must be monotone")
      assert(got.contains((300L, 501L)) && got.contains((301L, 501L)),
        "small-bucket delta pairs must be found under the cap")
      assert(!got.exists(p => p._1 == 500L || p._2 == 500L),
        "the saturated template delta doc's candidates all sit in " +
          "over-cap buckets — its pairs must be dropped under the cap")
    } finally spark.conf.unset(TextQueries.DedupMaxBucketConf)
  }

  test("the conf rejects negative caps loudly") {
    spark.conf.set(TextQueries.DedupMaxBucketConf, "-3")
    try {
      val e = intercept[IllegalArgumentException] {
        TextQueries.dedupMaxBucket(spark) }
      assert(e.getMessage.contains("maxBucket"))
    } finally spark.conf.unset(TextQueries.DedupMaxBucketConf)
  }
}
