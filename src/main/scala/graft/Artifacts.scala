package graft

import org.apache.spark.sql.SparkSession

/** The corpus-level artifact families (build once per corpus snapshot,
  * read by every consumer) as named build thunks — ONE list shared by
  * the bench protocol (which prices each family as its own `build`
  * entry before the sweeps) and the scaling harness (which prewarms
  * both comparison dirs so per-query ratios measure queries, not
  * whichever query visits the store first). Every thunk calls the exact
  * shared getter the queries call (same fingerprint keys), so nothing
  * double-builds.
  */
object Artifacts {
  def families(spark: SparkSession, sfDir: String): Seq[(String, () => Unit)] = Seq(
    "dedup" -> { () =>
      graft.operators.TextQueries.lshNeardupPairsShared(spark, sfDir)
      graft.operators.TextQueries.neardupComponentsShared(spark, sfDir)
      () },
    // lex builds BEFORE lm/bpe: both now derive their token streams from
    // the lexdocs artifact (tokenize once per corpus snapshot), so the
    // staging table must not land inside another family's cold timing
    "lex" -> { () =>
      graft.operators.TextQueries.lexDocsShared(spark, sfDir)
      graft.operators.TextQueries.lexDfShared(spark, sfDir)
      graft.operators.TextQueries.gram5Shared(spark, sfDir)
      graft.operators.TextQueries.dsirFeatsShared(spark, sfDir)
      () },
    "lm" -> (() => { graft.operators.TextQueries.docSurprisalShared(spark, sfDir); () }),
    "nb" -> (() => { graft.operators.TextQueries.nbQualityScored(spark, sfDir); () }),
    "spans" -> (() => { graft.operators.TextQueries.spanRunsShared(spark, sfDir); () }),
    "bloom" -> { () =>
      graft.operators.TextQueries.benchGramsShared(spark, sfDir)
      graft.operators.TextQueries.bloomSetShared(spark, sfDir)
      () },
    "bpe" -> (() => { graft.operators.TextQueries.bpeMergesShared(spark, sfDir, steps = 20); () }),
    "ivf" -> { () =>
      val e = Tables.embeddings(spark, sfDir)
      val cent = graft.operators.VectorQueries.trainCellsShared(spark, sfDir, e)
      graft.operators.VectorQueries.assignCellsShared(spark, sfDir, e, cent)
      () },
    "pq" -> { () =>
      val e = Tables.embeddings(spark, sfDir)
      val sv = graft.operators.VectorQueries.pqSubvecsShared(spark, sfDir, e)
      val cb = graft.operators.VectorQueries.pqCodebookShared(spark, sfDir, sv)
      graft.operators.VectorQueries.pqCodesShared(spark, sfDir, sv, cb)
      () },
    "srp" -> (() => { graft.operators.VectorQueries.srpBandsShared(spark, sfDir); () }))

  /** Build every family, returning (family, seconds); -1 marks a failed
    * build so it can never be mistaken for a timing. */
  def prewarm(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    families(spark, sfDir).map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok = try { build(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] build $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

  /** Drop the JVM-local (L1) artifact caches over the disk store. The
    * bench's noise-robust build gate times each family COLD more than
    * once in one JVM: repetition N+1 must re-derive from the corpus, not
    * hit the frames/driver-rows repetition N cached.
    */
  def dropSessionCaches(): Unit = {
    graft.operators.TextQueries.dropSessionCaches()
    graft.operators.VectorQueries.dropSessionCaches()
  }

  /** Noise-robust cold-build pricing: time every family against `reps`
    * FRESH store roots (set per repetition via the session conf; L1
    * caches dropped so each pass is a genuine re-derivation) and report
    * each family's MIN across repetitions. A single host stall — r12
    * fired the build gate on 5/8 families from one window whose canary
    * noise band was 7.5× — now has to span every repetition of a family
    * to poison its reported cost, while a real regression moves ALL
    * repetitions and still trips the gate. Any failed repetition keeps
    * the -1 failure sentinel. Leaves the conf pointing at the FIRST
    * (fully published) root with empty L1s: the sweeps then read
    * published artifacts — the deployed steady state.
    */
  def prewarmCold(spark: SparkSession, sfDir: String, roots: Seq[String])
      : Seq[(String, Double)] = {
    require(roots.nonEmpty)
    val reps = roots.map { root =>
      spark.conf.set("spark.graft.artifacts.path", root)
      dropSessionCaches()
      prewarm(spark, sfDir).toMap
    }
    spark.conf.set("spark.graft.artifacts.path", roots.head)
    dropSessionCaches()
    families(spark, sfDir).map { case (name, _) =>
      val samples = reps.map(_(name))
      name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
    }
  }
}
