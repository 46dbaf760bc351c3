package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.functions.expressions.VectorExpressions.cosineSim
import graft.operators.{IndexMaintenance, VectorQueries}

/** Streaming SEMANTIC-dedup admission — the streaming form of q119's
  * SemDeDup (Abbas et al. 2023) and the fourth member of the admission
  * family (NearDup lexical, Embedding SRP, Quote): a vector is admitted
  * iff it does not semantically duplicate (within-cell cosine ≥ tau) any
  * previously admitted vector or a surviving vector of its own batch.
  *
  * The blocking index is the corpus's PERSISTED IVF geometry (the q46
  * trained-centroid artifact — `cent` is passed in, never retrained
  * here): each batch assigns to its nearest cell against the broadcast
  * centroids, and the pairwise stage is cell-equi — per batch the cost
  * is Σ_cell |batch∩cell|·|store∩cell| + |batch∩cell|², never batch ×
  * store. Unlike the SRP gate's hash buckets, a cell cannot silently
  * fill with copies: copies ARE within-cell near-dups and get dropped,
  * and cell population is bounded by the trainer's corpus-sized nlist
  * (`VectorQueries.IvfTargetCellSize`).
  *
  * Keep rule: WITHIN a batch the true SemDeDup rule applies — the MORE
  * prototypical member (higher cosine to its own centroid, ties the
  * larger id) of a duplicate pair drops, preserving diversity. Versus
  * the store the BATCH member drops unconditionally: the stored copy is
  * already published to `keptPath` and consumed downstream — an
  * admission gate cannot unpublish — so the diversity-preferring choice
  * only applies where both members are still pending (the documented
  * deviation from the batch operator's oust-the-prototype behavior,
  * which `IndexMaintenance.refreshSemDedup` keeps for offline state).
  *
  * Geometry staleness is ENFORCED, not assumed: the store pins the
  * centroid fingerprint it was scored under
  * ([[IndexMaintenance.centroidFingerprint]]); an admit against a
  * retrained geometry fails loudly instead of mixing csims from two
  * geometries — the same contract the maintenance family carries.
  *
  * Epoch idempotence: admitted vectors append as deterministic
  * `epoch=<batchId>` partitions (overwrite mode), a vector never
  * duplicates its own stored copy (id filter), and the kept set is
  * deterministic — a retried foreachBatch epoch replays to the same
  * state.
  */
object SemanticAdmission {

  private def scored(vecs: DataFrame, cent: DataFrame): DataFrame =
    VectorQueries.assignCells(vecs, cent)
      .join(broadcast(cent), "cell")
      .select(col("vec_id"), col("cell"), col("embedding"),
        cosineSim(col("embedding"), col("centroid")).as("csim"))

  def admit(batch: DataFrame, batchId: Long, cent: DataFrame,
            storePath: String, keptPath: String,
            tau: Double = 0.95, expectedStoreBytes: Long = 0L)
      : Seq[AdmissionStore.WidthSignal] = {
    val s = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    def exists(sub: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$storePath/$sub"))

    // geometry pin: first admit records the fingerprint; every later
    // admit must match it — a retrained index invalidates every stored
    // csim and cell id at once, and failing loudly here is the only
    // sound behavior (same axis as refreshSemDedup's rebuild report)
    val fp = IndexMaintenance.centroidFingerprint(cent)
    if (exists("geometry")) {
      val stored = s.read.parquet(s"$storePath/geometry")
        .select("fp").head().getString(0)
      if (stored != fp) throw new IllegalStateException(
        s"semantic-admission store was scored under centroid geometry " +
          s"$stored but the gate was given $fp — the index was " +
          "retrained; rebuild the admission store")
    } else {
      import s.implicits._
      Seq(fp).toDF("fp").write.mode("overwrite")
        .parquet(s"$storePath/geometry")
    }

    val m = scored(batch.select(col("vec_id"), col("embedding")), cent)
      .localCheckpoint()

    // vs the admitted store: cell-equi bipartite join; the batch member
    // loses (see keep-rule doc above); own stored copy exempt (retry).
    // The members read prunes to the batch's own cells' key-hash
    // partitions (AdmissionStore layout) — per-batch store IO is
    // O(touched partitions), not O(store)
    val dupVsStore = AdmissionStore.readPrunedIfExists(s,
        s"$storePath/members", m, col("cell")) match {
      case None => m.select(col("vec_id")).limit(0)
      case Some(members) => m.alias("a")
        .join(members.alias("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .filter(cosineSim(col("a.embedding"), col("b.embedding")) >= tau)
        .select(col("a.vec_id")).distinct()
    }

    // within the batch: the SemDeDup keep rule — higher csim (more
    // prototypical) drops, ties drop the larger id (q119's exact rule)
    val dupInBatch = m.alias("a")
      .join(m.alias("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(cosineSim(col("a.embedding"), col("b.embedding")) >= tau)
      .select(when(col("a.csim") > col("b.csim") ||
          (col("a.csim") === col("b.csim") &&
            col("a.vec_id") > col("b.vec_id")), col("a.vec_id"))
        .otherwise(col("b.vec_id")).as("vec_id"))
      .distinct()

    val kept = m
      .join(dupVsStore.unionByName(dupInBatch).distinct(),
        Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // deterministic epoch dirs: a retried batch overwrites its own output
    kept.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$keptPath/epoch=$batchId")
    // the store keeps (cell, csim) alongside so no future batch ever
    // re-scores admitted vectors against the centroids. An EMPTY epoch
    // appends nothing: Spark writes a file-less dir for an empty frame,
    // and the store read above would then die on schema inference
    // forever after — the one way a batch could poison the gate.
    if (kept.isEmpty) Seq.empty
    else Seq(AdmissionStore.writeEpoch(kept, col("cell"),
      s"$storePath/members", batchId, expectedStoreBytes))
  }

  /** Fold accumulated epoch partitions into a single base epoch (offline
    * maintenance, ENFORCED since r17 by AdmissionStore's per-table lock +
    * epoch-drift guard; rename results checked so a failure cannot
    * silently empty the store). The geometry pin survives untouched.
    */
  def compact(s: SparkSession, storePath: String): Unit =
    AdmissionStore.compactEpochs(s, storePath, "members")

  /** Full offline maintenance: fold epochs, then re-bucket when the
    * width signal fired (the AdmissionStore lifecycle); the geometry
    * pin survives untouched. */
  def maintain(s: SparkSession, storePath: String,
      targetBucketBytes: Long = AdmissionStore.TargetBucketBytes)
      : Seq[AdmissionStore.LayoutReport] = {
    compact(s, storePath)
    AdmissionStore.maintain(s, s"$storePath/members", col("cell"),
      targetBucketBytes).toSeq
  }

  /** Wire as a streaming sink over a (vec_id, embedding) stream against
    * a frozen trained geometry. */
  def stream(vecs: DataFrame, cent: DataFrame, storePath: String,
             keptPath: String, checkpoint: String,
             tau: Double = 0.95,
             expectedStoreBytes: Long = 0L): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        admit(batch, id, cent, storePath, keptPath, tau, expectedStoreBytes)
        ()
      }
}
