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
    "lm" -> (() => { graft.operators.TextQueries.docSurprisalShared(spark, sfDir); () }),
    "lex" -> { () =>
      graft.operators.TextQueries.lexDocsShared(spark, sfDir)
      graft.operators.TextQueries.lexDfShared(spark, sfDir)
      graft.operators.TextQueries.gram5Shared(spark, sfDir)
      graft.operators.TextQueries.dsirFeatsShared(spark, sfDir)
      () },
    "nb" -> (() => { graft.operators.TextQueries.nbQualityScored(spark, sfDir); () }),
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
}
