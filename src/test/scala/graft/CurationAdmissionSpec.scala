package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CurationAdmission

/** Streaming curation admission: the q100 funnel in micro-batch form —
  * quality gate, frozen-reference-LM gate, near-dup gate, per-epoch
  * audit accounting, idempotent retries.
  */
class CurationAdmissionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = "/root/testdata/sf0.001"

  // a doc whose quality is high (>= 20 alpha tokens, no punctuation,
  // stopword-rich) but whose bigrams are ALL absent from the reference
  // corpus: every bigram pays the punk penalty ln(n_bigrams + 1), far
  // above any per-lang tail cutoff → must drop at the LM gate
  private val nonsense = (Seq("the", "a", "of", "and", "in", "to", "is",
    "on", "for", "an") ++ (1 to 14).map(i => s"zzqword$i")).mkString(" ")

  // junk punctuation doc → quality gate (punct ratio ~1 kills the score)
  private val junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~"

  /** Reference artifacts loaded driver-side: (bigram LM, per-lang
    * cutoffs, unseen-bigram penalty). ONE loader for every test so the
    * replicas cannot drift from each other.
    */
  private def loadRef(ref: String)
      : (Map[String, Double], Map[String, Double], Double) = {
    val lm = spark.read.parquet(s"$ref/lm").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cuts = spark.read.parquet(s"$ref/cutoffs").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("cut")).toMap
    val punk = spark.read.parquet(s"$ref/params").head.getDouble(0)
    (lm, cuts, punk)
  }

  /** Driver-side replay of the LM gate's per-doc score. */
  private def scoreWith(lm: Map[String, Double], punk: Double)(
      text: String): Option[Double] = {
    val t = text.toLowerCase.replaceAll("[^a-z ]", " ").trim
      .split("\\s+").filter(_.nonEmpty)
    if (t.length < 2) None
    else Some(t.sliding(2).map(w => -math.log(
      lm.getOrElse(w.mkString(" "), punk))).sum / (t.length - 1))
  }

  /** Distinctness in the DEDUP GATE'S OWN metric — normalized 3-gram
    * shingle jaccard well under the 0.5 drop threshold (a raw word-set
    * heuristic can misclassify: two docs sharing a verbatim phrase may
    * differ in enough stray tokens to pass it while their shingle
    * jaccard still trips the gate).
    */
  private def shingleDistinct(a: String, b: String): Boolean = {
    val sa = graft.functions.TextFunctions.wordNgramsScala(a, 3).toSet
    val sb = graft.functions.TextFunctions.wordNgramsScala(b, 3).toSet
    sa.isEmpty || sb.isEmpty ||
      (sa & sb).size.toDouble / (sa | sb).size < 0.4
  }

  test("funnel gates fire by reason, audit conserves, retry is idempotent") {
    val ref = Files.createTempDirectory("cur_ref").toString
    val store = Files.createTempDirectory("cur_store").toString
    val kept = Files.createTempDirectory("cur_kept").toString
    val audit = Files.createTempDirectory("cur_audit").toString

    CurationAdmission.buildReference(spark, corpus, ref)
    assert(spark.read.parquet(s"$ref/lm").count() > 0)
    val (lm, cuts, punk) = loadRef(ref)
    assert(cuts.nonEmpty && cuts.values.forall(_ > 0))
    assert(-math.log(punk) > cuts.values.max,
      "the unseen-bigram penalty must exceed every tail cutoff for the nonsense fixture to be deterministic")

    // batch 0: real corpus docs that pass quality AND sit below their
    // lang's cutoff (selected by replaying the gates), plus the two
    // planted failures
    import graft.functions.TextFunctions._
    val candidates = Tables.documents(spark, corpus)
      .filter(qualityScore(col("text")) >= 0.72)
      .select("doc_id", "lang", "text").collect()
    val score = scoreWith(lm, punk) _
    val good = candidates.foldLeft(Vector.empty[org.apache.spark.sql.Row]) {
      (acc, r) =>
        val ok = acc.length < 3 &&
          score(r.getAs[String]("text")).exists(s =>
            s < cuts(r.getAs[String]("lang")) - 0.05) &&
          acc.forall(p => shingleDistinct(p.getAs[String]("text"),
            r.getAs[String]("text")))
        if (ok) acc :+ r else acc
    }
    assert(good.length == 3, "corpus no longer yields 3 clean admission fixtures")

    import spark.implicits._
    val batch0 = good.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[String]("lang"), r.getAs[String]("text"))).toSeq ++
      Seq((9001L, "en", junk), (9002L, "en", nonsense))
    val row0 = CurationAdmission.admit(batch0.toDF("doc_id", "lang", "text"),
      0L, ref, store, kept, audit)
    assert(row0.getAs[Long]("n_in") == 5)
    assert(row0.getAs[Long]("drop_quality") == 1, row0.toString)
    assert(row0.getAs[Long]("drop_lm") == 1, row0.toString)
    assert(row0.getAs[Long]("drop_dedup") == 0, row0.toString)
    assert(row0.getAs[Long]("drop_quote") == 0, row0.toString)
    assert(row0.getAs[Long]("admitted") == 3, row0.toString)
    // the audit row carries the dedup store's stamped fan-out (r16
    // lifecycle) — and ONLY the fan-out: byte-level width is
    // time-varying across retries, so it lives in the gates' returned
    // signals, keeping this row retry-deterministic
    assert(row0.getAs[Int]("store_k") ==
      graft.streaming.AdmissionStore.DefaultBuckets, row0.toString)
    val kept0 = spark.read.parquet(s"$kept/epoch=0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept0 == good.map(_.getAs[Long]("doc_id")).toSet)

    // batch 1: an exact clone of an admitted doc (new id) + one fresh
    // clean doc → dedup gate fires exactly once
    val fresh = candidates.filter { r =>
      val id = r.getAs[Long]("doc_id")
      !good.exists(_.getAs[Long]("doc_id") == id) &&
        score(r.getAs[String]("text")).exists(s =>
          s < cuts(r.getAs[String]("lang")) - 0.05) &&
        // must not near-duplicate a batch-0 admission — judged in the
        // gate's own shingle-jaccard metric
        good.forall(g => shingleDistinct(g.getAs[String]("text"),
          r.getAs[String]("text")))
    }.take(1)
    assume(fresh.length == 1, "no sufficiently-distinct fresh doc at this SF")
    val clone = (9100L, good.head.getAs[String]("lang"),
      good.head.getAs[String]("text"))
    val batch1 = Seq(clone,
      (fresh.head.getAs[Long]("doc_id"), fresh.head.getAs[String]("lang"),
        fresh.head.getAs[String]("text")))
    val row1 = CurationAdmission.admit(batch1.toDF("doc_id", "lang", "text"),
      1L, ref, store, kept, audit)
    assert(row1.getAs[Long]("drop_dedup") == 1, row1.toString)
    // an exact clone is attributed to DEDUP, not the quote gate (the
    // batch funnel's first-gate-catches order)
    assert(row1.getAs[Long]("drop_quote") == 0, row1.toString)
    assert(row1.getAs[Long]("admitted") == 1, row1.toString)

    // batch 2: a doc QUOTING 30 consecutive verbatim tokens of an
    // admitted doc — passes quality, the LM (its bigrams are the
    // corpus's own), and the near-dup gate (jaccard vs a long source
    // stays under threshold), but must trip the QUOTE gate. The
    // fixture is found by replaying the upstream gates, like `good`.
    val admittedDocs = (good.map(r => (r.getAs[String]("lang"),
      r.getAs[String]("text"))) :+
      ((fresh.head.getAs[String]("lang"), fresh.head.getAs[String]("text"))))
      .toVector
    def toksOf(t: String): Array[String] =
      t.toLowerCase.replaceAll("[^a-z ]", " ").trim
        .split("\\s+").filter(_.nonEmpty)
    val snippets = admittedDocs.flatMap { case (lang, text) =>
      val tk = toksOf(text)
      (0 to tk.length - 30).map(k => (lang, tk.slice(k, k + 30).mkString(" ")))
    }
    val quals = snippets.map(_._2).toDF("text")
      .select(graft.functions.TextFunctions.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    val quoteFixture = snippets.zip(quals).collectFirst {
      case ((lang, sn), q)
          if q >= 0.72 && score(sn).exists(s => s < cuts(lang) - 0.05) &&
            admittedDocs.forall { case (_, t) => shingleDistinct(t, sn) } =>
        (lang, sn)
    }
    assume(quoteFixture.isDefined,
      "corpus yields no quality+LM-passing 30-token quote fixture")
    val (qlang, snippet) = quoteFixture.get
    val row2 = CurationAdmission.admit(
      Seq((9200L, qlang, snippet)).toDF("doc_id", "lang", "text"),
      2L, ref, store, kept, audit)
    assert(row2.getAs[Long]("drop_quote") == 1 &&
      row2.getAs[Long]("drop_dedup") == 0 &&
      row2.getAs[Long]("drop_quality") == 0 &&
      row2.getAs[Long]("drop_lm") == 0 &&
      row2.getAs[Long]("admitted") == 0, row2.toString)

    // audit conservation on every epoch row
    spark.read.parquet(audit).collect().foreach { r =>
      assert(r.getAs[Long]("n_in") == r.getAs[Long]("drop_quality") +
        r.getAs[Long]("drop_lm") + r.getAs[Long]("drop_dedup") +
        r.getAs[Long]("drop_quote") +
        r.getAs[Long]("admitted"), s"audit row does not conserve: $r")
    }

    // retried epoch: identical audit, no double admission
    val row1r = CurationAdmission.admit(batch1.toDF("doc_id", "lang", "text"),
      1L, ref, store, kept, audit)
    assert(row1r == row1, s"retry diverged: $row1r vs $row1")
    val keptAll = spark.read.parquet(kept).select("doc_id")
      .collect().map(_.getLong(0))
    assert(keptAll.length == keptAll.distinct.length,
      "retry double-admitted a document")
  }

  test("armed decontamination gate drops benchmark-quoting docs, attributed last") {
    val ref = Files.createTempDirectory("cur5_ref").toString
    val store = Files.createTempDirectory("cur5_store").toString
    val kept = Files.createTempDirectory("cur5_kept").toString
    val audit = Files.createTempDirectory("cur5_audit").toString
    val deconRef = Files.createTempDirectory("cur5_decon").toString
    CurationAdmission.buildReference(spark, corpus, ref)
    val (lm, cuts, punk) = loadRef(ref)
    val score = scoreWith(lm, punk) _

    // two corpus docs that pass quality, sit below their lang's LM
    // cutoff, and are mutually shingle-distinct (so only the decon gate
    // can separate them)
    import graft.functions.TextFunctions._
    val candidates = Tables.documents(spark, corpus)
      .filter(qualityScore(col("text")) >= 0.72)
      .select("doc_id", "lang", "text").collect()
    val picks = candidates.foldLeft(Vector.empty[org.apache.spark.sql.Row]) {
      (acc, r) =>
        val ok = acc.length < 2 &&
          score(r.getAs[String]("text")).exists(s =>
            s < cuts(r.getAs[String]("lang")) - 0.05) &&
          acc.forall(p => shingleDistinct(p.getAs[String]("text"),
            r.getAs[String]("text")))
        if (ok) acc :+ r else acc
    }
    assert(picks.length == 2, "corpus no longer yields 2 clean fixtures")
    val e = picks(0); val g = picks(1)

    // the frozen eval suite IS doc e's text: every one of e's 5-grams is
    // a benchmark gram (hit fraction 1.0 — the maximal contamination),
    // while g's fraction is only the Bloom FP floor
    import spark.implicits._
    val suiteGrams = Seq(e.getAs[String]("text")).toDF("text")
      .select(explode(array_distinct(wordNgramsUdf(5)(col("text")))).as("g"))
      .distinct()
    graft.streaming.DecontaminationAdmission.buildReference(suiteGrams, deconRef)

    val batch = Seq(
      (9100L, e.getAs[String]("lang"), e.getAs[String]("text")),
      (9101L, g.getAs[String]("lang"), g.getAs[String]("text")))
      .toDF("doc_id", "lang", "text")
    val row = CurationAdmission.admit(batch, 0L, ref, store, kept, audit,
      benchRefPath = Some(deconRef))
    assert(row.getAs[Long]("n_in") == 2 &&
      row.getAs[Long]("drop_quality") == 0 &&
      row.getAs[Long]("drop_lm") == 0 &&
      row.getAs[Long]("drop_dedup") == 0 &&
      row.getAs[Long]("drop_quote") == 0, row.toString)
    assert(row.getAs[Long]("drop_decon") == 1, row.toString)
    assert(row.getAs[Long]("admitted") == 1, row.toString)
    assert(spark.read.parquet(s"$kept/epoch=0").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(9101L))

    // retried epoch reproduces the verdicts
    val rowR = CurationAdmission.admit(batch, 0L, ref, store, kept, audit,
      benchRefPath = Some(deconRef))
    assert(rowR.getAs[Long]("drop_decon") == 1 &&
      rowR.getAs[Long]("admitted") == 1, rowR.toString)

    // unarmed control: the same batch through a four-gate funnel admits
    // BOTH docs — the fifth gate is the only thing separating them
    val store2 = Files.createTempDirectory("cur5_store2").toString
    val kept2 = Files.createTempDirectory("cur5_kept2").toString
    val audit2 = Files.createTempDirectory("cur5_audit2").toString
    val row2 = CurationAdmission.admit(batch, 0L, ref, store2, kept2, audit2)
    assert(row2.getAs[Long]("drop_decon") == 0 &&
      row2.getAs[Long]("admitted") == 2, row2.toString)
  }

  test("a batch dropped wholesale at dedup does not kill the funnel") {
    val ref = Files.createTempDirectory("curw_ref").toString
    val store = Files.createTempDirectory("curw_store").toString
    val kept = Files.createTempDirectory("curw_kept").toString
    val audit = Files.createTempDirectory("curw_audit").toString
    CurationAdmission.buildReference(spark, corpus, ref)
    val (lm, cuts, punk) = loadRef(ref)
    val score = scoreWith(lm, punk) _
    import graft.functions.TextFunctions._
    val pick = Tables.documents(spark, corpus)
      .filter(qualityScore(col("text")) >= 0.72)
      .select("doc_id", "lang", "text").collect()
      .find(r => score(r.getAs[String]("text")).exists(s =>
        s < cuts(r.getAs[String]("lang")) - 0.05)).get
    import spark.implicits._
    val doc = (pick.getAs[Long]("doc_id"), pick.getAs[String]("lang"),
      pick.getAs[String]("text"))
    val row0 = CurationAdmission.admit(Seq(doc).toDF("doc_id", "lang", "text"),
      0L, ref, store, kept, audit)
    assert(row0.getAs[Long]("admitted") == 1, row0.toString)
    // epoch 1: NOTHING but exact clones of the admitted doc (pure
    // re-sends — routine in a deployed stream). Every doc drops at
    // dedup, the kept epoch dir is file-less, and the funnel must
    // account the epoch and carry on — not die reading it back
    val clones = Seq((8001L, doc._2, doc._3), (8002L, doc._2, doc._3))
    val row1 = CurationAdmission.admit(
      clones.toDF("doc_id", "lang", "text"), 1L, ref, store, kept, audit)
    assert(row1.getAs[Long]("n_in") == 2 &&
      row1.getAs[Long]("drop_dedup") == 2 &&
      row1.getAs[Long]("admitted") == 0, row1.toString)
    // and epoch 2 still works end-to-end after the empty epoch
    val row2 = CurationAdmission.admit(
      Seq((8003L, doc._2, doc._3)).toDF("doc_id", "lang", "text"),
      2L, ref, store, kept, audit)
    assert(row2.getAs[Long]("drop_dedup") == 1 &&
      row2.getAs[Long]("admitted") == 0, row2.toString)
  }

  test("multi-epoch drive: conservation holds, clones stay blocked across compaction") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val ref = Files.createTempDirectory("cur_ref3").toString
    val store = Files.createTempDirectory("cur_store3").toString
    val kept = Files.createTempDirectory("cur_kept3").toString
    val audit = Files.createTempDirectory("cur_audit3").toString
    CurationAdmission.buildReference(spark, corpus, ref)
    val (lm, cuts, punk) = loadRef(ref)
    val score = scoreWith(lm, punk) _
    // greedy pool of mutually-distinct clean docs (pass quality + LM,
    // distinctness in the gate's own shingle metric)
    val pool = Tables.documents(spark, corpus)
      .filter(qualityScore(col("text")) >= 0.72)
      .select("doc_id", "lang", "text").collect()
      .foldLeft(Vector.empty[(Long, String, String)]) { (acc, r) =>
        val text = r.getAs[String]("text")
        val ok = score(text).exists(s =>
          s < cuts(r.getAs[String]("lang")) - 0.05) &&
          acc.forall { case (_, _, p) => shingleDistinct(p, text) }
        if (ok) acc :+ ((r.getAs[Long]("doc_id"), r.getAs[String]("lang"), text))
        else acc
      }
    val epochs = math.min(10, (pool.length - 1) / 2)
    assume(epochs >= 4, s"clean pool too small for a multi-epoch drive: ${pool.length}")
    var admittedTotal = 0L
    (0 until epochs).foreach { e =>
      // mid-drive maintenance: compaction must not unblock clones
      if (e == epochs / 2)
        graft.streaming.NearDupAdmission.compact(spark, store)
      val fresh = pool.slice(1 + 2 * e, 3 + 2 * e)
      val batch = fresh ++ Seq(
        (if (e == 0) pool.head._1 else 50000L + e, pool.head._2, pool.head._3),
        (60000L + e, "en", junk))
      val row = CurationAdmission.admit(
        batch.toDF("doc_id", "lang", "text"), e.toLong, ref, store, kept, audit)
      val (nIn, dq, dl, dd, dquo, adm) = (row.getAs[Long]("n_in"),
        row.getAs[Long]("drop_quality"), row.getAs[Long]("drop_lm"),
        row.getAs[Long]("drop_dedup"), row.getAs[Long]("drop_quote"),
        row.getAs[Long]("admitted"))
      assert(nIn == dq + dl + dd + dquo + adm,
        s"epoch $e does not conserve: $row")
      assert(dq == 1, s"epoch $e: junk not dropped at quality: $row")
      if (e == 0) assert(adm == 3 && dd == 0, s"epoch 0 unexpected: $row")
      else assert(dd >= 1, s"epoch $e: the epoch-0 clone was not dedup-dropped: $row")
      admittedTotal += adm
    }
    // the admitted corpus is exactly the distinct pool docs that went in
    val keptIds = spark.read.parquet(kept).select("doc_id")
      .collect().map(_.getLong(0))
    assert(keptIds.length == keptIds.distinct.length, "a doc was admitted twice")
    assert(keptIds.length.toLong == admittedTotal,
      "kept store disagrees with audit accounting")
    assert(!keptIds.exists(_ >= 50000L), "a clone id slipped into the corpus")
    // audit has one row per epoch
    assert(spark.read.parquet(audit).count() == epochs)
  }

  test("streaming wrapper drives the funnel through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Files.createTempDirectory("cur_ref2").toString
    val store = Files.createTempDirectory("cur_store2").toString
    val kept = Files.createTempDirectory("cur_kept2").toString
    val audit = Files.createTempDirectory("cur_audit2").toString
    val ckpt = Files.createTempDirectory("cur_ckpt2").toString
    CurationAdmission.buildReference(spark, corpus, ref)

    // a clean doc under an UNKNOWN lang code: it passes quality but has
    // no reference cutoff, so the LM gate must drop it (conservative)
    val unknownLang = Tables.documents(spark, corpus)
      .filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.72)
      .select("text").head.getString(0)

    val mem = MemoryStream[(Long, String, String)]
    val q = CurationAdmission.stream(
      mem.toDF().toDF("doc_id", "lang", "text"),
      ref, store, kept, audit, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    mem.addData((9001L, "en", junk), (9002L, "en", nonsense),
      (9003L, "xx", unknownLang))
    val run = q.start(); run.awaitTermination(120000)
    val a = spark.read.parquet(audit).head
    assert(a.getAs[Long]("n_in") == 3 && a.getAs[Long]("admitted") == 0 &&
      a.getAs[Long]("drop_lm") == 2, a.toString)
  }

  test("readAudits reads mixed pre-/post-store_k audit tables under the pinned schema") {
    // pre-r16 audit epochs have no store_k column; a root read's
    // inferred schema then depends on which file wins — readAudits pins
    // the schema and defaults the missing column to 0 (r16 ADVICE)
    val audit = Files.createTempDirectory("cur_audit3").toString
    def row(storeK: Option[Int]) = {
      val base = spark.range(1).select(
        lit(10L).as("n_in"), lit(1L).as("drop_quality"),
        lit(2L).as("drop_lm"), lit(3L).as("drop_dedup"),
        lit(0L).as("drop_quote"), lit(0L).as("drop_decon"),
        lit(4L).as("admitted"))
      storeK.map(k => base.withColumn("store_k", lit(k))).getOrElse(base)
    }
    row(None).write.parquet(s"$audit/epoch=0") // pre-r16 epoch
    row(Some(64)).write.parquet(s"$audit/epoch=1")
    val rows = CurationAdmission.readAudits(spark, audit)
      .orderBy("epoch").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("store_k") == 0, rows(0).toString)
    assert(rows(1).getAs[Int]("store_k") == 64, rows(1).toString)
    assert(rows.forall(r => r.getAs[Long]("n_in") == 10L &&
      r.getAs[Long]("admitted") == 4L))
  }
}
