package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Shared store plumbing for the admission gates' epoch-partitioned
  * tables. ONE copy of the delete/rename compaction protocol (its
  * checked results exist precisely because a silent failure would empty
  * a store) instead of a per-gate clone drifting apart.
  * QuoteAdmission's census compaction deliberately does NOT delegate
  * here: it carries the hardened aside-path crash protocol, because its
  * consumers (quoteDrops) fail loudly on the aside marker mid-recovery.
  *
  * BLOCKING-KEY LAYOUT (r15): every stateful gate's store table is
  * additionally partitioned by `pb = pmod(hash(blocking key), NumBuckets)`
  * inside each epoch dir (`.../epoch=N/pb=K/part-*.parquet`). The r14
  * verdict's admission-family 100× blocker was the per-batch store SCAN:
  * the JOIN cost was bounded (band/bucket/cell-equi) but every batch
  * re-read the whole accumulated store. With the key-hash layout a batch
  * first computes its own touched pb set (bounded by NumBuckets — a
  * collect of ≤NumBuckets ints, never data-sized) and the store read
  * prunes to those partition dirs at FILE level (Spark partition
  * pruning; AdmissionPruningSpec asserts the scanned file count). A
  * small batch touching b of K buckets reads ~b/K of the store; the
  * worst case (batch touches every bucket) degrades to the old full
  * scan, never below it. Compaction preserves the layout.
  */
private[graft] object AdmissionStore {

  /** Partition-dir fan-out per epoch. Test-scale knob: big enough that
    * a one-doc batch provably prunes, small enough that tiny soak
    * batches don't scatter one-row files. A 100 TB deployment raises it
    * (store/K should be a few HDFS blocks); the layout is self-describing
    * (pb is a discovered partition column), so K is frozen per store at
    * first write — mixing widths in one store would route reads wrong,
    * hence ONE constant, not a parameter.
    */
  val NumBuckets = 16

  /** The blocking-key partition bucket: pmod(hash(key), NumBuckets). */
  def pb(key: Column): Column = pmod(hash(key), lit(NumBuckets))

  /** The batch's touched pb set for a blocking-key column — ≤NumBuckets
    * ints, the one driver-side collect in the pruned-read path. */
  def touchedBuckets(df: DataFrame, key: Column): Seq[Int] =
    df.select(pb(key).as("pb")).distinct().collect().map(_.getInt(0)).toSeq

  private def fsOf(s: SparkSession) = org.apache.hadoop.fs.FileSystem
    .get(s.sparkContext.hadoopConfiguration)
  private def pbkPath(table: String) =
    new org.apache.hadoop.fs.Path(s"$table/_PBK")

  /** Stamp the fan-out K a table was written with. The layout is only
    * self-describing for the dirs a store HAPPENS to contain — the
    * reader's pb = hash % K must equal the writer's or pruned reads
    * route to the wrong dirs and every gate fails OPEN (an empty store
    * view admits duplicates of everything), so K is persisted at
    * `<table>/_PBK` and validated on every pruned read. A mismatch here
    * (someone rebuilt with a different NumBuckets against a live store)
    * is as fatal as a corrupt store: fail loudly. */
  def stampLayout(s: SparkSession, table: String): Unit = {
    val fs = fsOf(s); val p = pbkPath(table)
    if (!fs.exists(p)) {
      // create-no-overwrite: two racing first writers both stamp the
      // same constant, so losing the race is benign
      try {
        val out = fs.create(p, false)
        try out.write(NumBuckets.toString.getBytes("UTF-8"))
        finally out.close()
      } catch { case _: java.io.IOException if fs.exists(p) => () }
    }
    checkLayout(s, table)
  }

  private def checkLayout(s: SparkSession, table: String): Unit = {
    val fs = fsOf(s); val p = pbkPath(table)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"admission store $table has no _PBK layout marker — it predates " +
        "the keyed layout (or the marker was deleted); rebuild the store")
    val k = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      fs.open(p)), "UTF-8").trim
    if (k != NumBuckets.toString) throw new IllegalStateException(
      s"admission store $table was written with pb fan-out K=$k but this " +
        s"build routes with K=$NumBuckets — pruned reads would silently " +
        "miss the stored rows; rebuild the store under one K")
  }

  /** Write one epoch of a store table under the blocking-key layout:
    * pb partition dirs inside the deterministic epoch dir (idempotent
    * retries), plus the layout stamp. ONE definition for every gate so
    * the written layout can never drift from the pruned-read routing. */
  def writeEpoch(df: DataFrame, key: Column, table: String,
      epoch: Long): Unit = {
    df.withColumn("pb", pb(key))
      .write.partitionBy("pb")
      .mode("overwrite").parquet(s"$table/epoch=$epoch")
    stampLayout(df.sparkSession, table)
  }

  /** Read a store table pruned to the touched pb partition dirs. The
    * filter is on a partition column, so untouched dirs are never
    * listed into the scan (file-level pruning, not row filtering);
    * the layout stamp is validated first (see [[stampLayout]]). */
  def readTouched(s: SparkSession, path: String, touched: Seq[Int]): DataFrame = {
    checkLayout(s, path)
    s.read.parquet(path).filter(col("pb").isin(touched: _*))
  }

  /** Fold `storePath/sub`'s accumulated epoch partitions into a single
    * base epoch. Only a genuinely-ABSENT live table is a no-op (nothing
    * to compact — the exists check plus AnalysisException for the
    * file-less-dir schema-inference case); any other read failure (IO
    * error, corrupt footer, permissions) propagates, matching the
    * object's fail-loud contract — the old catch-everything silently
    * skipped compaction over an unreadable store. Delete/rename
    * failures throw rather than silently leaving an empty store. */
  def compactEpochs(s: SparkSession, storePath: String, sub: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    val live = s"$storePath/$sub"
    val tmp = s"$storePath/${sub}_compact_tmp"
    if (!fs.exists(new org.apache.hadoop.fs.Path(live))) return
    val df =
      try s.read.parquet(live)
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    // preserve the blocking-key layout: pb is a discovered partition
    // column of the accumulated epochs — the compacted base keeps it
    val parts = df.columns.filter(_ == "pb")
    df.drop("epoch").write.partitionBy(parts: _*)
      .mode("overwrite").parquet(s"$tmp/epoch=0")
    val livePath = new org.apache.hadoop.fs.Path(live)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (!fs.delete(livePath, true) && fs.exists(livePath))
      throw new java.io.IOException(s"compact: cannot remove $live")
    if (!fs.rename(tmpPath, livePath))
      throw new java.io.IOException(s"compact: rename $tmp -> $live failed")
    // the delete took the layout marker with it — re-stamp the folded base
    if (parts.nonEmpty) stampLayout(s, live)
  }
}
