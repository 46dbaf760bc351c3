package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupMaintenance

/** Incremental near-dup graph maintenance: appending a document segment
  * refreshes the persisted pair graph and component labels for O(delta)
  * and the result is BIT-IDENTICAL to a from-scratch rebuild — min-label
  * fixpoint is order-independent, so the warm-started labels land on the
  * same unique answer (component = min doc_id).
  */
class DedupMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def pairsOf(g: DedupMaintenance.DedupGraph): Set[(Long, Long)] =
    g.pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def labelsOf(g: DedupMaintenance.DedupGraph): Map[Long, Long] =
    g.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental refresh equals from-scratch rebuild, pair-for-pair and label-for-label") {
    import spark.implicits._
    val all = Tables.documents(spark, dir).select("doc_id", "text")
    // 80/20 split, plus a planted cross-split near-dup cluster: a delta
    // doc that exactly clones a base doc (new id), and a delta-delta
    // clone pair — so the refresh must discover base×delta AND
    // delta×delta edges, and a merge must propagate into an EXISTING
    // component's labels
    val base = all.filter(col("doc_id") % 5 =!= 3)
    val baseText = base.orderBy("doc_id").limit(1).collect()(0)
    val delta = all.filter(col("doc_id") % 5 === 3)
      .unionByName(Seq(
        (900001L, baseText.getString(1)),
        (900002L, baseText.getString(1))).toDF("doc_id", "text"))

    val fromScratch = DedupMaintenance.build(
      base.unionByName(delta))
    val refreshed = DedupMaintenance.refresh(DedupMaintenance.build(base), delta)

    assert(pairsOf(refreshed) == pairsOf(fromScratch),
      "refresh found a different pair set than the rebuild")
    assert(labelsOf(refreshed) == labelsOf(fromScratch),
      "warm-started labels diverged from the rebuild's fixpoint")

    // the planted clones actually exercised both edge classes
    val ps = pairsOf(refreshed)
    val b = baseText.getLong(0)
    assert(ps.contains((b, 900001L)) || ps.contains((900001L, b)),
      "base×delta clone pair not discovered")
    assert(ps.contains((900001L, 900002L)),
      "delta×delta clone pair not discovered")
    // and all three carry the existing component's min-id label
    val ls = labelsOf(refreshed)
    assert(ls(900001L) == ls(b) && ls(900002L) == ls(b),
      "clone labels did not merge into the base component")
  }

  test("property: refresh equals rebuild on seeded random corpora and splits") {
    // fixed-seed random corpora (the SkewAndPropertiesSpec idiom): tiny
    // vocab → dense near-dup structure, random base/delta split — the
    // equality must hold whatever cluster shapes and split boundaries
    // the randomness produces, including components strung ACROSS the
    // split by chains of pairwise-similar docs
    import spark.implicits._
    import scala.util.Random
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val docs = (0 until 60).map { i =>
        // half the docs mutate an earlier doc's token stream (1-2 edits)
        // — guaranteed high-jaccard chains; the rest are fresh draws
        val toks =
          if (i >= 10 && rnd.nextBoolean()) {
            val base = (10 + rnd.nextInt(20)).max(10)
            val stream = Array.fill(base)(vocab(rnd.nextInt(vocab.length)))
            stream(rnd.nextInt(stream.length)) = vocab(rnd.nextInt(vocab.length))
            stream
          } else Array.fill(10 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
        (i.toLong, toks.mkString(" "))
      }
      val all = docs.toDF("doc_id", "text")
      val cut = rnd.nextInt(3) + 2 // base = ids with doc_id % cut != 0
      val base = all.filter(col("doc_id") % cut =!= 0)
      val delta = all.filter(col("doc_id") % cut === 0)
      val scratch = DedupMaintenance.build(all)
      val refreshed = DedupMaintenance.refresh(DedupMaintenance.build(base), delta)
      assert(pairsOf(refreshed) == pairsOf(scratch),
        s"seed $seed cut $cut: pair sets diverged")
      assert(labelsOf(refreshed) == labelsOf(scratch),
        s"seed $seed cut $cut: labels diverged")
    }
  }

  test("refresh of an empty delta is a no-op on pairs and labels") {
    val base = Tables.documents(spark, dir).select("doc_id", "text")
      .filter(col("doc_id") % 5 =!= 3)
    val g = DedupMaintenance.build(base)
    import spark.implicits._
    val g2 = DedupMaintenance.refresh(g,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(pairsOf(g2) == pairsOf(g))
    assert(labelsOf(g2) == labelsOf(g))
  }

  test("adaptive maintain: segment deltas refresh, bulk loads rebuild, both equal the rebuild") {
    val all = Tables.documents(spark, dir).select("doc_id", "text")
    // segment-sized append (~4% of base) → refresh arm
    val base = all.filter(col("doc_id") % 25 =!= 7)
    val small = all.filter(col("doc_id") % 25 === 7)
    val g0 = DedupMaintenance.build(base)
    val (gS, repS) = DedupMaintenance.maintain(g0, small)
    assert(repS.mode == "refresh", s"4% delta should refresh: $repS")
    assert(repS.fraction < DedupMaintenance.RebuildFraction &&
      repS.deltaDocs > 0 && repS.baseDocs > 0, repS.toString)

    // bulk load (~33% of base) → rebuild arm
    val base2 = all.filter(col("doc_id") % 4 =!= 1)
    val bulk = all.filter(col("doc_id") % 4 === 1)
    val g1 = DedupMaintenance.build(base2)
    val (gB, repB) = DedupMaintenance.maintain(g1, bulk)
    assert(repB.mode == "rebuild", s"33% delta should rebuild: $repB")

    // both arms land on the from-scratch answer — the policy is a pure
    // cost choice, never a semantics choice
    val expS = DedupMaintenance.build(base.unionByName(small))
    val expB = DedupMaintenance.build(all)
    assert(pairsOf(gS) == pairsOf(expS) && labelsOf(gS) == labelsOf(expS),
      "refresh arm diverged from the rebuild answer")
    assert(pairsOf(gB) == pairsOf(expB) && labelsOf(gB) == labelsOf(expB),
      "rebuild arm diverged from the from-scratch answer")
  }
}
