package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.functions.TextFunctions._

/** Streaming near-dup admission — the streaming form of q38's dedup-keep:
  * a document is admitted iff it does not near-duplicate (exact
  * set-jaccard >= threshold, MinHash-LSH band candidates) any previously
  * admitted document, or a lower-id document of its own batch (the same
  * greedy pair-drop q38 applies). Admitted fingerprints append to the
  * store as `epoch=<batchId>` partitions; overwriting the deterministic
  * epoch directory makes foreachBatch retries idempotent.
  *
  * Scale shape: the store keeps two tables — `bands` (bucket, doc_id),
  * the compact blocking index, and `docs` (doc_id, shingles), the verify
  * payload. Candidate generation is a distributed bucket equi-join of the
  * batch's bands against the store's bands (shuffle key = bucket, cost
  * Σ bucket²); shingle payloads join back only for surviving candidate
  * pairs. Nothing data-sized crosses the driver.
  */
object NearDupAdmission {

  def admit(batch: DataFrame, batchId: Long, storePath: String,
            keptPath: String, threshold: Double = 0.5, numHashes: Int = 64,
            bands: Int = 32, rows: Int = 2, maxBucket: Int = 0,
            expectedStoreBytes: Long = 0L)
      : Seq[AdmissionStore.WidthSignal] = {
    val s = batch.sparkSession
    val all = batch
      .select(col("doc_id"), col("text"),
        wordNgramsUdf(3)(col("text")).as("shingles"))
      .localCheckpoint()
    val docs = all.filter(size(col("shingles")) > 0)
    // shingle-less docs (< 3 alphabetic words) cannot near-duplicate
    // anything — always admitted, exactly as the batch q38 keeps them
    val trivial = all.filter(size(col("shingles")) === 0)
    val banded = graft.operators.TextQueries
      .bandedOf(docs, numHashes, bands, rows).localCheckpoint()

    // only a genuinely-missing store reads as empty; any other failure
    // (corrupt file, IO error, an interrupted maintenance publish)
    // aborts the epoch — swallowing it would admit duplicates of
    // everything previously admitted.
    //
    // dups vs the already-admitted store (bipartite band join). The
    // store is key-hash partitioned (AdmissionStore layout, routing K
    // from the store's own stamp): the bands read prunes to the batch's
    // own band buckets — complete for the join (every row of a touched
    // BUCKET shares its pb dir) and for the hotness judgment (a bucket
    // outside the batch's pb set can produce no candidate, and every
    // batch bucket is touched by definition) — and the shingle-payload
    // read prunes to the surviving candidates' doc-id buckets. Per-batch
    // store IO is O(touched partitions), not O(store) — the r14
    // verdict's admission-family 100× blocker.
    val dupVsStore = AdmissionStore.readPrunedIfExists(s,
        s"$storePath/bands", banded, col("bucket")) match {
      case None => docs.select(col("doc_id")).limit(0)
      case Some(storeBandsRaw) =>
        {
        // the hot-bucket cap must also gate this bipartite join: a hot
        // template bucket ACCUMULATED in the store would otherwise still
        // produce batch×store quadratic candidates even with the in-batch
        // cap on. Hotness is judged on the combined population (store +
        // batch) so a bucket just under the cap on each side alone cannot
        // slip through at 2× the cap combined.
        val (batchBands, storeBands) =
          if (maxBucket <= 0) (banded, storeBandsRaw)
          else {
            val hot = storeBandsRaw.select(col("bucket"))
              .unionAll(banded.select(col("bucket")))
              .groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
              .filter(col("bn") > maxBucket).select(col("bucket"))
            (banded.join(broadcast(hot), Seq("bucket"), "left_anti"),
              storeBandsRaw.join(broadcast(hot), Seq("bucket"), "left_anti"))
          }
        val cand = batchBands
          .join(storeBands.select(col("bucket"), col("doc_id").as("sd")), "bucket")
          // a doc never duplicates its own stored fingerprint — this is
          // what keeps a RETRIED epoch idempotent (its admitted docs are
          // already in the store under the same ids)
          .filter(col("doc_id") =!= col("sd"))
          .select(col("doc_id"), col("sd")).distinct()
          // materialized: read twice below (the touched-pb collect and
          // the verify join) — and candidate-pair-sized by construction
          .localCheckpoint()
        cand
          .join(docs.select(col("doc_id"), col("shingles").as("sh_a")), "doc_id")
          .join(AdmissionStore.readPruned(s, s"$storePath/docs",
              cand, col("sd"))
            .select(col("doc_id").as("sd"), col("shingles").as("sh_b")), "sd")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
          .filter(col("inter") / col("uni") >= threshold)
          .select(col("doc_id")).distinct()
        }
    }
    // dups within the batch: the shared LSH pair core; greedy pair-drop,
    // higher id loses (q38 semantics)
    val dupInBatch = graft.operators.TextQueries
      .lshPairsFromDocs(docs, banded, threshold, maxBucket)
      .select(col("d2").as("doc_id")).distinct()

    val kept = docs
      .join(dupVsStore.unionByName(dupInBatch).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // deterministic epoch dirs: a retried batch overwrites its own
    // output. An EMPTY epoch appends nothing to the store: Spark writes
    // a file-less dir for an empty frame, and the next batch's store
    // read would then die on schema inference — the one way a batch
    // could poison the gate.
    kept.select("doc_id", "text")
      .unionByName(trivial.select("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$keptPath/epoch=$batchId")
    if (kept.isEmpty) Seq.empty
    else {
      // key-hash partition dirs inside the epoch (AdmissionStore layout):
      // docs by doc_id (the verify join's key), bands by bucket (the
      // blocking join's key). The first epoch sizes each table's fan-out
      // from the caller's expected-scale hint; every epoch's width
      // signal rides back in the return so the stream's reports carry
      // the layout's growth story (AdmissionStore lifecycle).
      Seq(
        AdmissionStore.writeEpoch(kept.select("doc_id", "shingles"),
          col("doc_id"), s"$storePath/docs", batchId, expectedStoreBytes),
        AdmissionStore.writeEpoch(banded.join(kept.select("doc_id"), "doc_id"),
          col("bucket"), s"$storePath/bands", batchId, expectedStoreBytes))
    }
  }

  /** Compact the store's accumulated epoch partitions into a single base
    * epoch — unbounded epoch-dir growth is the one O(epochs) listing cost
    * in the admission design. Offline maintenance, and since r17 that
    * contract is ENFORCED, not prose: the compaction runs as the table's
    * elected single maintainer (AdmissionStore's lock), a concurrent
    * writeEpoch fails loudly against the held lock, and the publish
    * aborts on epoch-set drift — a raced epoch can no longer be silently
    * swapped away with the superseded tree.
    */
  def compact(s: SparkSession, storePath: String): Unit =
    Seq("docs", "bands")
      .foreach(AdmissionStore.compactEpochs(s, storePath, _))

  /** Full offline maintenance: fold epochs, then re-bucket any table
    * whose width signal says the store has outgrown its fan-out
    * (store bytes / K past `targetBucketBytes` — the AdmissionStore
    * lifecycle). Each table re-buckets on its own blocking key, the
    * same key its pruned reads route on. */
  def maintain(s: SparkSession, storePath: String,
      targetBucketBytes: Long = AdmissionStore.TargetBucketBytes)
      : Seq[AdmissionStore.LayoutReport] = {
    compact(s, storePath)
    Seq("docs" -> col("doc_id"), "bands" -> col("bucket")).flatMap {
      case (sub, key) =>
        AdmissionStore.maintain(s, s"$storePath/$sub", key, targetBucketBytes)
    }
  }

  /** Wire as a streaming sink over a (doc_id, text) stream. */
  def stream(docs: DataFrame, storePath: String, keptPath: String,
             checkpoint: String, threshold: Double = 0.5,
             maxBucket: Int = 0, expectedStoreBytes: Long = 0L): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        admit(batch, id, storePath, keptPath, threshold, maxBucket = maxBucket,
          expectedStoreBytes = expectedStoreBytes)
        ()
      }
}
