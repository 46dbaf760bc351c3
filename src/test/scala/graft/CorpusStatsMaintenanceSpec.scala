package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusStatsMaintenance._

/** Incremental lexical-index and corpus-LM maintenance: an appended
  * segment refreshes every table for O(delta) and the result is
  * BIT-IDENTICAL to a from-scratch rebuild — the same exact-equivalence
  * contract DedupMaintenanceSpec pins for labels, here for the df
  * census, the shingle relation, the LM count tables, the derived
  * conditional LM, and the per-doc surprisal scores under it.
  */
class CorpusStatsMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def corpus() = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def split() = {
    val d = corpus()
    (d.filter(col("doc_id") % 5 =!= 3), d.filter(col("doc_id") % 5 === 3))
  }

  private def censusMap(df: DataFrame, k: String, c: String): Map[String, Long] =
    df.collect().map(r => r.getAs[String](k) -> r.getAs[Long](c)).toMap

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("lexical index refresh == rebuild, bit-for-bit, and never re-reads base docs") {
    val (base, delta) = split()
    val idx0 = buildLex(base)
    val refreshed = refreshLex(idx0, delta)
    val rebuilt = buildLex(base.unionByName(delta))
    assert(censusMap(refreshed.df, "token", "df") ==
      censusMap(rebuilt.df, "token", "df"),
      "df census diverged from rebuild")
    assert(rowSet(refreshed.grams.select(col("doc_id"), col("g"))) ==
      rowSet(rebuilt.grams.select(col("doc_id"), col("g"))),
      "5-gram relation diverged from rebuild")
    assert(refreshed.docs.count() == rebuilt.docs.count())
    // the base tokenized rows are REUSED verbatim (row-local contract):
    // every base doc's token array in the refreshed index is the same
    // rows the bootstrap produced
    assert(refreshed.docs.join(idx0.docs.select(col("doc_id")), "doc_id")
      .count() == idx0.docs.count())
    // cross-module drift tripwires: this module re-states the engine's
    // artifact builders (TextQueries.lexDfShared / gram5Shared) rather
    // than sharing their store-backed getters — these pins are what
    // catches a builder-expression change landing on one side only
    val engineDf = graft.operators.TextQueries.lexDfShared(spark, dir)
    assert(censusMap(refreshed.df, "token", "df") ==
      censusMap(engineDf, "token", "df"),
      "maintained df census drifted from the engine's lexDfShared")
    val engineGrams = graft.operators.TextQueries.gram5Shared(spark, dir)
    assert(rowSet(refreshed.grams.select(col("doc_id"), col("g"))) ==
      rowSet(engineGrams.select(col("doc_id"), col("g"))),
      "maintained gram relation drifted from the engine's gram5Shared")
  }

  test("LM count refresh == rebuild; derived LM and surprisal scores identical") {
    val (base, delta) = split()
    val lm0 = buildLm(base)
    val refreshed = refreshLm(lm0, delta)
    val rebuilt = buildLm(base.unionByName(delta))
    assert(censusMap(refreshed.c2, "bg", "c2") == censusMap(rebuilt.c2, "bg", "c2"),
      "bigram counts diverged from rebuild")
    assert(censusMap(refreshed.c1, "w1", "c1") == censusMap(rebuilt.c1, "w1", "c1"),
      "unigram counts diverged from rebuild")
    // identical counts -> identical conditional probabilities -> the
    // full-corpus re-score under the refreshed LM is bit-identical to
    // scoring under a rebuilt one (same IEEE expressions, same inputs)
    val all = base.unionByName(delta)
    val sR = scoreDocs(all, refreshed.lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sB = scoreDocs(all, rebuilt.lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sR.keySet == sB.keySet)
    assert(sR.forall { case (d, s) => sB(d) == s },
      "surprisal under refreshed LM diverged from rebuilt LM")
    // and the engine's own corpus LM (TextQueries.corpusBigramLm) agrees
    // with the maintained counts' derived LM — ONE census math
    val (_, engineLm) = graft.operators.TextQueries.corpusBigramLm(spark, dir)
    val eng = engineLm.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ours = refreshed.lm.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours == eng, "maintained LM drifted from the engine's corpus LM")
  }

  test("NB statistics refresh == rebuild: per-class token census, priors, labeled rows") {
    val (base, delta) = split()
    val nb0 = buildNb(base)
    val refreshed = refreshNb(nb0, delta)
    val rebuilt = buildNb(base.unionByName(delta))
    def tfMap(df: DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("tf_hi"), r.getAs[Long]("tf_lo"))).toMap
    assert(tfMap(refreshed.tf) == tfMap(rebuilt.tf),
      "per-class token census diverged from rebuild")
    assert((refreshed.dHi, refreshed.dLo) == (rebuilt.dHi, rebuilt.dLo),
      "class priors diverged from rebuild")
    // the labeled corpus table is row-local: refreshed rows == rebuilt
    // rows, and the base's rows are reused verbatim (no base re-label)
    assert(rowSet(refreshed.docs.select(col("doc_id"), col("split"), col("cls")))
      == rowSet(rebuilt.docs.select(col("doc_id"), col("split"), col("cls"))))
    assert(refreshed.docs.join(nb0.docs.select(col("doc_id")), "doc_id")
      .count() == nb0.docs.count())
    // identical counts ⇒ identical smoothed model ⇒ identical margins
    // (the derivation is deterministic vocab-bounded arithmetic; the
    // shared nbLabeled definition is what TextQueries' q92 artifact
    // builds from, so batch and maintenance can't drift)
    val emptyDelta = corpus().filter(lit(false))
    val noop = refreshNb(rebuilt, emptyDelta)
    assert((noop.dHi, noop.dLo) == (rebuilt.dHi, rebuilt.dLo) &&
      tfMap(noop.tf) == tfMap(rebuilt.tf),
      "empty delta changed the NB statistics")
  }

  test("degenerate deltas: short docs contribute no bigrams/grams but keep censuses exact") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val delta = Seq((10L, "alpha"), (11L, ""), (12L, "beta gamma"))
      .toDF("doc_id", "text")
    val lex = refreshLex(buildLex(base), delta)
    val rebuilt = buildLex(base.unionByName(delta))
    assert(censusMap(lex.df, "token", "df") == censusMap(rebuilt.df, "token", "df"))
    assert(lex.grams.filter(col("doc_id") >= 10L).count() == 0,
      "a <5-word doc grew a 5-gram")
    val lm = refreshLm(buildLm(base), delta)
    val lmRebuilt = buildLm(base.unionByName(delta))
    assert(censusMap(lm.c2, "bg", "c2") == censusMap(lmRebuilt.c2, "bg", "c2"))
    // doc 10/11 have < 2 tokens: absent from scoring, as everywhere
    val scored = scoreDocs(base.unionByName(delta), lm.lm)
      .collect().map(_.getLong(0)).toSet
    assert(!scored.contains(10L) && !scored.contains(11L) && scored.contains(12L))
  }

  private def runsMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("maxrun")).toMap

  test("span index refresh == rebuild; affected ⊎ untouched reproduces the report") {
    val (base, delta) = split()
    val idx0 = buildSpans(base)
    val r = refreshSpans(idx0, delta)
    val rebuilt = buildSpans(base.unionByName(delta))
    // the distinct-doc census merges by SUM exactly (disjoint doc sets)
    assert(censusMap(r.index.census, "h", "ndocs") ==
      censusMap(rebuilt.census, "h", "ndocs"),
      "span census diverged from rebuild")
    assert(rowSet(r.index.wins) == rowSet(rebuilt.wins),
      "window relation diverged from rebuild")
    // steady-state path: re-score ONLY the affected docs on top of the
    // previous report — must equal the rebuild's report doc for doc
    val affected = r.affected.collect().map(_.getLong(0)).toSet
    val old = runsMap(spanRuns(idx0))
    val rescored = runsMap(spanRuns(r.index, Some(r.affected)))
    val merged = old.view.filterKeys(d => !affected(d)).toMap ++ rescored
    assert(merged == runsMap(spanRuns(rebuilt)),
      "incremental re-score diverged from rebuild")
    // spans only grow on appends (ndocs is monotone)
    old.foreach { case (d, run) =>
      assert(merged.getOrElse(d, 0L) >= run, s"doc $d span shrank on append")
    }
  }

  test("an appended quote flips an OLD doc's verdict — the movable-flag case") {
    import spark.implicits._
    def w(prefix: Char, i: Int): String =
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val words = (0 until 40).map(w('w', _))
    val a = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val idx0 = buildSpans(a)
    assert(spanRuns(idx0).collect().isEmpty, "a lone doc has no dup spans")
    // the delta doc quotes 25 consecutive tokens (positions 5..29) of
    // doc 1 inside otherwise-unique filler
    val quote = words.slice(4, 29)
    val deltaText = ((0 until 10).map(w('f', _)) ++ quote ++
      (0 until 6).map(w('g', _))).mkString(" ")
    val r = refreshSpans(idx0, Seq((2L, deltaText)).toDF("doc_id", "text"))
    val affected = r.affected.collect().map(_.getLong(0)).toSet
    assert(affected == Set(1L, 2L),
      s"affected set wrong: $affected — doc 1's verdict moved without notice")
    // a 25-token shared span = 16 consecutive duplicated stride-1 windows
    val runs = runsMap(spanRuns(r.index, Some(r.affected)))
    assert(runs == Map(1L -> 16L, 2L -> 16L), runs.toString)
  }

  test("bloom bitset refresh == rebuild under the frozen width; overlap idempotent; growth signals") {
    import spark.implicits._
    // the q120 build input: distinct held-out-split 5-grams, arriving as
    // a large bootstrap segment + a ~10% later segment (a new eval suite)
    val grams = corpus()
      .select(explode(array_distinct(graft.functions.TextFunctions
        .wordNgramsUdf(5)(col("text")))).as("g"),
        graft.functions.TextFunctions.splitAssign(col("doc_id")).as("split"))
      .filter(col("split") =!= "train").select(col("g")).distinct()
      .localCheckpoint()
    val b2 = grams.filter(length(col("g")) % 10 === 1)
    val b1 = grams.filter(length(col("g")) % 10 =!= 1)
    assert(b2.count() > 0 && b2.count() < b1.count() / 4)
    val idx0 = buildBloom(b1)
    val (idx1, rep) = refreshBloom(idx0, b2)
    assert(rep.mode == "incremental",
      s"a ~10% benchmark growth must not re-size the width: $rep")
    def wordsMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = buildBloomAt(grams, idx0.m)
    assert(wordsMap(idx1.words) == wordsMap(rebuilt),
      "refreshed bitset diverged from a rebuild at the frozen width")
    // bit_or is idempotent: replaying an already-inserted segment leaves
    // every lane untouched (the gram COUNT overcounts — by design,
    // conservative toward an early rebuild recommendation)
    val (idx2, _) = refreshBloom(idx1, b2)
    assert(wordsMap(idx2.words) == wordsMap(idx1.words),
      "overlapping delta flipped lanes — inserts are not idempotent")
    assert(idx2.grams > idx1.grams)
    // kernel probe soundness, replayed with java MessageDigest: every
    // inserted gram's 4 sliced positions are set in the refreshed bitset
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wm = wordsMap(idx1.words)
    b2.limit(20).collect().map(_.getString(0)).foreach { g =>
      val h = md5hex("bloom:" + g)
      (0 until 4).foreach { i =>
        val p = java.lang.Long.parseLong(h.substring(8 * i, 8 * i + 8), 16) % idx0.m
        val bit = 1L << (p % 32).toInt
        assert((wm.getOrElse(p / 32, 0L) & bit) != 0,
          s"gram '$g' probe $i not set — kernel drifted from the builder")
      }
    }
    // a benchmark grown past the width's load budget carries the
    // deterministic rebuild signal (the SRP width analogue)
    val big = (0 until 20000).map(i => s"synthetic gram number $i").toDF("g")
    val (_, rep2) = refreshBloom(idx1, big)
    assert(rep2.mode == "rebuild" && rep2.widthNow > rep2.frozenWidth, rep2.toString)
  }
}
