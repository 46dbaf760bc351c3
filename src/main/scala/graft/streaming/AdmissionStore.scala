package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared store plumbing for the admission gates' epoch-partitioned
  * tables. ONE copy of the delete/rename compaction protocol (its
  * checked results exist precisely because a silent failure would empty
  * a store) instead of a per-gate clone drifting apart.
  * QuoteAdmission's census compaction deliberately does NOT delegate
  * here: it carries the hardened aside-path crash protocol, because its
  * consumers (quoteDrops) fail loudly on the aside marker mid-recovery.
  */
private[streaming] object AdmissionStore {

  /** Fold `storePath/sub`'s accumulated epoch partitions into a single
    * base epoch. A missing/unreadable live table is a no-op (nothing to
    * compact); delete/rename failures throw rather than silently
    * leaving an empty store. */
  def compactEpochs(s: SparkSession, storePath: String, sub: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    val live = s"$storePath/$sub"
    val tmp = s"$storePath/${sub}_compact_tmp"
    val df = try s.read.parquet(live) catch { case _: Throwable => return }
    df.drop("epoch").write.mode("overwrite").parquet(s"$tmp/epoch=0")
    val livePath = new org.apache.hadoop.fs.Path(live)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (!fs.delete(livePath, true) && fs.exists(livePath))
      throw new java.io.IOException(s"compact: cannot remove $live")
    if (!fs.rename(tmpPath, livePath))
      throw new java.io.IOException(s"compact: rename $tmp -> $live failed")
  }
}
