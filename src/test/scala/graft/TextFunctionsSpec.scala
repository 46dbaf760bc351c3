package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {

  test("fnv1a64 is the standard FNV-1a (public test vectors)") {
    assert(fnv1a64("") == 0xcbf29ce484222325L)
    assert(fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(fnv1a64("foobar") == 0x85944171f73967e8L)
  }

  test("simhash: identical texts equal, similar texts near, different far") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "the quick brown fox jumps over the lazy cat near the river bank"
    val c = "completely unrelated words about spark query optimization engines"
    assert(simhash64(a) == simhash64(a))
    assert(hamming64(simhash64(a), simhash64(b)) <= 12)
    assert(hamming64(simhash64(a), simhash64(c)) >
      hamming64(simhash64(a), simhash64(b)))
  }

  test("minhash signature estimates jaccard") {
    def shingles(s: String): Seq[String] =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSeq
    val a = shingles("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16")
    val b = shingles("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 x y")
    val sa = minhashSignature(a, 128)
    val sb = minhashSignature(b, 128)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val inter = a.toSet.intersect(b.toSet).size.toDouble
    val union = a.toSet.union(b.toSet).size.toDouble
    val trueJac = inter / union
    assert(math.abs(est - trueJac) < 0.2, s"est $est vs true $trueJac")
    // determinism across calls
    assert(sa.toSeq == minhashSignature(a, 128).toSeq)
  }

  test("lsh band keys collide iff band slices equal") {
    val sig1 = (1L to 32L).toSeq
    val sig2 = sig1.updated(31, 99L) // differs only in last band
    val k1 = lshBandKeys(sig1, 8, 4)
    val k2 = lshBandKeys(sig2, 8, 4)
    assert(k1.take(7) == k2.take(7) && k1(7) != k2(7))
  }

  test("winnowing fingerprints: deterministic, shared for shared substrings") {
    val a = winnowingFingerprints("the common long substring appears here", 5, 4)
    val b = winnowingFingerprints("the common long substring appears here", 5, 4)
    assert(a.toSeq == b.toSeq)
    val c = winnowingFingerprints("prefix junk the common long substring appears here", 5, 4)
    assert(a.toSet.intersect(c.toSet).nonEmpty)
  }

  test("langId identifies clear samples") {
    assert(langIdScala("the cat and the dog are in the garden with the children") == "en")
    assert(langIdScala("la casa de los niños está en el centro de la ciudad que es") == "es")
    assert(langIdScala("die kinder sind in der schule und der garten ist schön und die") == "de")
    assert(langIdScala("这是一个中文句子用于测试语言识别功能") == "zh")
    assert(langIdScala("") == "und")
  }

  test("reference tokenizer emits word 2-grams then 3-grams") {
    // semantics of SmartAddressBuildService.tokenize:135-153
    val toks = "flat no 12, mg road".toLowerCase.replaceAll("[^a-z ]", " ")
      .split("\\s+").filter(_.nonEmpty)
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val trigrams = toks.sliding(3).map(_.mkString(" ")).toSeq
    assert(bigrams == Seq("flat no", "no mg", "mg road"))
    assert(trigrams == Seq("flat no mg", "no mg road"))
  }

  test("wordNgramsFromTokens over the scala tokenize equals wordNgramsScala") {
    // the lexdocs-artifact shingle path (gram5Shared slides over staged
    // token arrays) must be bit-equal to the from-text UDF it replaced
    val texts = Seq("flat no 12, mg road", "", "a", "one two three four five six",
      "  padded   spaces  ", "UPPER lower 99 mix!", null)
    for (t <- texts; n <- Seq(2, 3, 5)) {
      val toks: Seq[String] =
        if (t == null) Seq.empty
        else t.toLowerCase.replaceAll("[^a-z ]", " ").trim
          .split("\\s+").filter(_.nonEmpty).toSeq
      assert(wordNgramsFromTokens(toks, n).toSeq ==
        wordNgramsScala(t, n).toSeq, s"text=$t n=$n")
    }
    assert(wordNgramsFromTokens(null, 3).isEmpty)
  }

  test("qualityMetricsScala edge semantics match the Column forms' rules") {
    // engine-level row-for-row equality is pinned in QueriesSpec (the
    // sf0.001 corpus); here the hand-replicated edge semantics:
    // space-only trim (Spark trim()), split keeping the empty token of
    // "", codepoint lengths, null propagation
    assert(qualityMetricsScala(null).isEmpty)
    val (s0, p0, q0, n0) = qualityMetricsScala("").get
    assert(s0 == 0.0 && p0 == 0.0 && n0 == 1.0)
    // "" splits to [""] (one raw token) exactly like Spark's
    // split(trim(''), '\s+'): lenScore = 1/20, stopScore 0, punctScore 1
    assert(q0 == BigDecimal(0.05 * 0.4 + 1.0 * 0.3 + 0.0 * 0.3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // tab is NOT trimmed by Spark trim(): "\ta b" splits to ["","a","b"]
    // (3 raw tokens) while " a b" space-trims to 2 — the q values differ
    val (_, _, qTab, _) = qualityMetricsScala("\ta b").get
    val (_, _, qSp, _) = qualityMetricsScala(" a b").get
    assert(qTab != qSp, "space-only trim semantics lost")
    val (st, pt, _, _) = qualityMetricsScala("the cat! sat?").get
    assert(st == 1.0 / 3.0) // 'the' of 3 normalized tokens
    assert(pt == 2.0 / 11.0) // '!' '?' over 11 non-space chars
  }

  test("BPE merge edges: overlapping pairs are greedy left-to-right") {
    // "aaa</w>" merging (a,a): the first pair wins, no re-scan of the
    // merged symbol — ["aa","a","</w>"], the standard BPE convention
    assert(bpeApplyMerge(Seq("a", "a", "a", "</w>"), "a", "a") ==
      Seq("aa", "a", "</w>"))
    // four in a row merge pairwise
    assert(bpeApplyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // absent pair is a no-op; single symbol untouched
    assert(bpeApplyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(bpeApplyMerge(Seq("x"), "x", "x") == Seq("x"))
    // encode applies merges in training order (later merges see earlier
    // ones): [a,a,</w>] → [aa,</w>] → [aa</w>]
    assert(bpeEncodeWord("aa", Seq(("a", "a"), ("aa", "</w>"))) ==
      Seq("aa</w>"))
  }

  test("BPE trainer matches an independent reference on the classic corpus") {
    // independent in-memory BPE (Sennrich et al. 2016) — same tie-break
    def referenceBpe(vocab: Map[String, Long], steps: Int): Seq[(String, String, Long)] = {
      var v = vocab.map { case (w, f) => (bpeInitialSymbols(w), f) }.toSeq
      (1 to steps).flatMap { _ =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        v.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
        }
        if (counts.isEmpty) None
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          v = v.map { case (syms, f) => (bpeApplyMerge(syms, l, r), f) }
          Some((l, r, c))
        }
      }
    }
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val vocabDf = corpus.toSeq.toDF("w", "freq")
      .select(col("freq"),
        udf((w: String) => bpeInitialSymbols(w)).apply(col("w")).as("syms"))
    val got = graft.operators.TextQueries
      .bpeMergesFromVocab(spark, vocabDf, steps = 10)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val exp = referenceBpe(corpus, 10)
    assert(got == exp, s"\ngot: $got\nexp: $exp")
    // human-checkable grounding: the classic first merges
    assert(got.take(3).map(m => (m._1, m._2)) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")), got.take(3).toString)
    // encoding with the learned table segments a held-out word sensibly:
    // "lowest" shares low- and -est with the training corpus
    val table = got.map(m => (m._1, m._2))
    val lowest = bpeEncodeWord("lowest", table)
    assert(lowest.last == "est</w>" || lowest.contains("est</w>"),
      s"encoded: $lowest")
    assert(bpeEncodeWord("low", table) != bpeInitialSymbols("low"),
      "training words must compress")
  }
}
