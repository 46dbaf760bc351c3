package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.functions.expressions.VectorExpressions.{cosineSim, srpBucketExpr}

/** Streaming embedding near-dup admission — the streaming form of the
  * q45/q62 vector dedup, and the embedding sibling of the text
  * `NearDupAdmission`: a vector is admitted iff it does not
  * near-duplicate (exact cosine ≥ threshold; SRP-banded candidates) any
  * previously admitted vector, or a lower-id vector of its own batch.
  * Admitted vectors append to the store as `epoch=<batchId>` partitions;
  * overwriting the deterministic epoch directory makes foreachBatch
  * retries idempotent (a retried batch's vectors never match their own
  * stored copies — the id filter below — and the kept set is
  * deterministic, so a partial prior attempt replays to the same state).
  *
  * Scale shape: the store keeps two tables — `buckets` ((table, bucket),
  * vec_id), the compact blocking index, and `vecs` (vec_id, embedding),
  * the verify payload. Candidate generation is a distributed bucket
  * equi-join of the batch's bands against the store's (shuffle key =
  * (table, bucket), cost Σ bucket²); embeddings join back only for
  * surviving candidate pairs. Nothing data-sized crosses the driver.
  * `bits` is the q62 dial: size it to the expected store
  * (~log₂(n)−3, so buckets stay ~8 deep); at the ≥0.95 near-dup
  * threshold the 3-table OR-amplification keeps per-pair miss ≈ 5e-4 at
  * 8 bits (see `VectorQueries.embeddingLeakPairsLsh`).
  */
object EmbeddingAdmission {

  /** Three OR-amplified band buckets per vector (independent plane sets
    * at offsets 0/16/32, as q62).
    */
  private def bandedOf(vecs: DataFrame, bits: Int): DataFrame =
    vecs.select(col("vec_id"), explode(array(
      struct(lit(0).as("t"), srpBucketExpr(col("embedding"), bits, 0).as("b")),
      struct(lit(1).as("t"), srpBucketExpr(col("embedding"), bits, 16).as("b")),
      struct(lit(2).as("t"), srpBucketExpr(col("embedding"), bits, 32).as("b"))
    )).as("tb"))

  def admit(batch: DataFrame, batchId: Long, storePath: String,
            keptPath: String, threshold: Double = 0.95, bits: Int = 8,
            maxBucket: Int = 0, expectedStoreBytes: Long = 0L)
      : Seq[AdmissionStore.WidthSignal] = {
    val s = batch.sparkSession
    val vecs = batch.select(col("vec_id"), col("embedding")).localCheckpoint()
    val banded = bandedOf(vecs, bits).localCheckpoint()

    // only a genuinely-missing store reads as empty; any other failure
    // (incl. an interrupted maintenance publish) aborts the epoch —
    // swallowing it would admit duplicates of everything previously
    // admitted (same contract as NearDupAdmission). Store reads prune
    // to the batch's touched key-hash partitions (AdmissionStore
    // layout, routing K from each table's own stamp): buckets by the
    // batch's own (t, b) bands, vecs by the surviving candidates'
    // vec_ids — per-batch store IO is O(touched partitions), not
    // O(store).
    def readStore(sub: String, batchKeys: DataFrame,
        key: org.apache.spark.sql.Column): Option[DataFrame] =
      AdmissionStore.readPrunedIfExists(s, s"$storePath/$sub", batchKeys, key)

    // skew guard judged on the combined store+batch bucket population —
    // a template bucket just under the cap on each side alone must not
    // slip through at 2× the cap combined (declared-lossy, as the text
    // admission's cap)
    def decap(storeBuckets: Option[DataFrame]): (DataFrame, Option[DataFrame]) =
      if (maxBucket <= 0) (banded, storeBuckets)
      else {
        val pop = storeBuckets.map(_.select(col("tb"))
            .unionAll(banded.select(col("tb"))))
          .getOrElse(banded.select(col("tb")))
        val hot = pop.groupBy(col("tb")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") > maxBucket).select(col("tb"))
        (banded.join(broadcast(hot), Seq("tb"), "left_anti"),
          storeBuckets.map(_.join(broadcast(hot), Seq("tb"), "left_anti")))
      }
    val (batchBuckets, storeBuckets) =
      decap(readStore("buckets", banded, col("tb")))

    // dups vs the already-admitted store (bipartite bucket join)
    val dupVsStore = storeBuckets match {
      case None => vecs.select(col("vec_id")).limit(0)
      case Some(sb) =>
        val cand = batchBuckets
          .join(sb.select(col("tb"), col("vec_id").as("sd")), "tb")
          // a vector never duplicates its own stored copy — retry safety
          .filter(col("vec_id") =!= col("sd"))
          .select(col("vec_id"), col("sd")).distinct()
          // materialized: read twice (touched-pb collect + verify join),
          // candidate-pair-sized by construction
          .localCheckpoint()
        cand
          .join(vecs.select(col("vec_id"), col("embedding").as("v_a")), "vec_id")
          .join(AdmissionStore.readPruned(s, s"$storePath/vecs",
              cand, col("sd"))
            .select(col("vec_id").as("sd"), col("embedding").as("v_b")), "sd")
          .filter(cosineSim(col("v_a"), col("v_b")) >= threshold)
          .select(col("vec_id")).distinct()
    }
    // dups within the batch: greedy pair-drop, higher id loses (q45/q38)
    val dupInBatch = batchBuckets.as("a")
      .join(batchBuckets.as("b"),
        col("a.tb") === col("b.tb") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
      .join(vecs.select(col("vec_id").as("d1"), col("embedding").as("v1")), "d1")
      .join(vecs.select(col("vec_id").as("d2"), col("embedding").as("v2")), "d2")
      .filter(cosineSim(col("v1"), col("v2")) >= threshold)
      .select(col("d2").as("vec_id")).distinct()

    val kept = vecs
      .join(dupVsStore.unionByName(dupInBatch).distinct(),
        Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // deterministic epoch dirs: a retried batch overwrites its own
    // output. An EMPTY epoch appends nothing to the store: Spark writes
    // a file-less dir for an empty frame, and the next batch's store
    // read would then die on schema inference — the one way a batch
    // could poison the gate.
    kept.write.mode("overwrite").parquet(s"$keptPath/epoch=$batchId")
    if (kept.isEmpty) Seq.empty
    else {
      // key-hash partition dirs inside the epoch (AdmissionStore layout):
      // vecs by vec_id (the verify join's key), buckets by the band key.
      // First epoch sizes each table's fan-out from the expected-scale
      // hint; width signals ride back per epoch (the lifecycle report).
      Seq(
        AdmissionStore.writeEpoch(kept, col("vec_id"),
          s"$storePath/vecs", batchId, expectedStoreBytes),
        AdmissionStore.writeEpoch(banded.join(kept.select("vec_id"), "vec_id"),
          col("tb"), s"$storePath/buckets", batchId, expectedStoreBytes))
    }
  }

  /** Fold accumulated epoch partitions into a single base epoch (offline
    * maintenance, ENFORCED since r17 by AdmissionStore's per-table lock +
    * epoch-drift guard — a racing writeEpoch fails loudly or aborts the
    * publish; rename results checked so a failure cannot silently empty
    * the store).
    */
  def compact(s: SparkSession, storePath: String): Unit =
    Seq("vecs", "buckets")
      .foreach(AdmissionStore.compactEpochs(s, storePath, _))

  /** Full offline maintenance: fold epochs, then re-bucket any table
    * whose width signal fired (the AdmissionStore lifecycle), each on
    * its own blocking key. */
  def maintain(s: SparkSession, storePath: String,
      targetBucketBytes: Long = AdmissionStore.TargetBucketBytes)
      : Seq[AdmissionStore.LayoutReport] = {
    compact(s, storePath)
    Seq("vecs" -> col("vec_id"), "buckets" -> col("tb")).flatMap {
      case (sub, key) =>
        AdmissionStore.maintain(s, s"$storePath/$sub", key, targetBucketBytes)
    }
  }

  /** Wire as a streaming sink over a (vec_id, embedding) stream. */
  def stream(vecs: DataFrame, storePath: String, keptPath: String,
             checkpoint: String, threshold: Double = 0.95, bits: Int = 8,
             maxBucket: Int = 0, expectedStoreBytes: Long = 0L): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        admit(batch, id, storePath, keptPath, threshold, bits, maxBucket,
          expectedStoreBytes)
        ()
      }
}
