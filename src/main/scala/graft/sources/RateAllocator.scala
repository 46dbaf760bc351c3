package graft.sources

/** Backlog-proportional admission control for a micro-batch streaming
  * source (SURVEY.md §2.11; the reference algorithm is
  * pulsar-spark-dstream .../PulsarHelper.scala:70-110, acceptance numbers
  * pinned by PulsarHelperTest.scala:72-99).
  *
  * Given a driver-side rate estimate and per-partition backlogs, each
  * partition's effective rate is its backlog share of the estimate, clamped
  * to [minRate, maxRate] (rates are in entries/sec after dividing by
  * avgMsgsPerEntry); with no estimate every partition gets maxRate. The
  * admitted entry count is ceil(batchSeconds × rate) capped by the backlog.
  *
  * This is the Structured-Streaming analogue of receiver backpressure: it
  * runs inside `latestOffset()` of a MicroBatchStream, is pure driver-side
  * arithmetic (O(partitions)), and never moves data.
  */
object RateAllocator {

  case class PartitionConfig(maxRatePerSec: Double, minRatePerSec: Double = 1.0,
                             avgMsgsPerEntry: Double = 1.0,
                             maxByteRatePerSec: Double = Double.MaxValue,
                             avgBytesPerEntry: Double = 1.0) {
    /** Entries/sec ceiling: message-rate cap AND byte-rate cap, whichever
      * binds (reference maxByteRatePerPartition, PulsarConf.scala:24-28 —
      * large entries throttle admission before the message cap does).
      */
    def maxEntriesPerSec: Double = {
      val byMsgs = maxRatePerSec / avgMsgsPerEntry
      val byBytes =
        if (maxByteRatePerSec == Double.MaxValue) Double.MaxValue
        else maxByteRatePerSec / math.max(1.0, avgBytesPerEntry)
      math.min(byMsgs, byBytes)
    }
  }

  /** Effective per-partition rate limits (entries/sec). */
  def effectiveRates(estimatedRate: Option[Long], backlogs: Seq[Long],
                     conf: Int => PartitionConfig): Seq[Double] = {
    estimatedRate.filter(_ > 0) match {
      case Some(rate) =>
        val totalLag = backlogs.sum
        backlogs.zipWithIndex.map { case (backlog, i) =>
          val c = conf(i)
          val maxRate = c.maxEntriesPerSec
          val backpressureRate =
            if (totalLag == 0) 0.0 else backlog / totalLag.toDouble * rate
          // min() with an uncapped (MaxValue/Infinity) ceiling is a no-op,
          // so the minRate floor applies uniformly — capped or not
          if (maxRate > 0)
            math.max(math.min(backpressureRate, maxRate), c.minRatePerSec)
          else backpressureRate
        }
      case None =>
        backlogs.indices.map(i => conf(i).maxEntriesPerSec)
    }
  }

  /** Entries to admit per partition this batch. */
  def maxEntriesPerPartition(estimatedRate: Option[Long], backlogs: Seq[Long],
                             batchIntervalMs: Long,
                             conf: Int => PartitionConfig): Seq[Long] = {
    val secs = batchIntervalMs.toDouble / 1000.0
    effectiveRates(estimatedRate, backlogs, conf).zip(backlogs).map {
      case (limit, backlog) => math.min(math.ceil(secs * limit).toLong, backlog)
    }
  }
}
