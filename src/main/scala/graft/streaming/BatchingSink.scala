package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

/** Batched external-sink writer (SURVEY.md §2.2 K4): the reference posts
  * JSON payloads to an HTTP bus in groups of N per partition
  * (BigfootClient.scala:12-49, group size ConfigMapUtil.scala:10 = 200).
  *
  * Spark-native form: a `ForeachWriter` that buffers rows per epoch
  * partition and flushes every `batchSize` — the transport is a pluggable
  * function so tests (and broker-less environments) inject a collector
  * while production injects an HTTP POST. Flush-on-close guarantees the
  * tail batch; failures propagate so the task (and epoch) retries —
  * at-least-once into an idempotent endpoint, matching the reference.
  *
  * Scale: buffering is O(batchSize) memory per task; each partition posts
  * independently so sink throughput scales with executors, and batchSize
  * amortizes per-request overhead exactly like the reference's grouped(200).
  */
class BatchingForeachWriter(batchSize: Int, post: Seq[String] => Unit)
    extends ForeachWriter[String] with Serializable {

  @transient private var buf: scala.collection.mutable.ArrayBuffer[String] = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    buf = scala.collection.mutable.ArrayBuffer.empty[String]
    true
  }

  override def process(value: String): Unit = {
    buf += value
    if (buf.length >= batchSize) flush()
  }

  override def close(errorOrNull: Throwable): Unit =
    if (errorOrNull == null) flush()

  private def flush(): Unit = {
    if (buf.nonEmpty) {
      post(buf.toSeq)
      buf.clear()
    }
  }
}

object BatchingSink {

  /** Batch-post every row of `payloads` (single string column) in groups
    * of `batchSize` per partition — the batch (foreachPartition) analogue
    * used by reconciliation jobs.
    */
  def postPartitioned(payloads: DataFrame, batchSize: Int,
                      post: Seq[String] => Unit): Unit = {
    payloads.foreachPartition { (rows: Iterator[Row]) =>
      rows.map(_.getString(0)).grouped(batchSize).foreach(g => post(g.toSeq))
    }
  }
}
