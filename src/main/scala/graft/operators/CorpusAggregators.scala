package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state corpus aggregators — the skew-proof forms of the
  * per-group selection operators (same buffer philosophy as
  * ElectionAggregators: merge cost O(cap) regardless of how many rows a
  * hot key receives, so a domain with 10⁹ docs costs the same shuffle
  * state as one with 20).
  */
object CorpusAggregators {

  /** Top-K rows per group under (quality DESC, id ASC), finished directly
    * into the (count, id-checksum, min-quality) summary q69 reports. The
    * buffer holds at most `cap` (quality, id) pairs sorted by the keep
    * order; reduce inserts only if the candidate beats the current tail
    * (or the buffer is short), merge is a bounded sorted merge. Compare
    * with the window form (sort every group's full history): this is a
    * partial+final ObjectHashAggregate whose map-side combine already
    * discards everything below the local top-K.
    */
  case class TopKBuf(rows: List[(Double, Long)])
  case class TopKOut(n_kept: Long, id_checksum: Long, min_quality: Double)

  class TopKByQualityAgg(cap: Int)
      extends Aggregator[(String, Double, Long), TopKBuf, TopKOut]
      with Serializable {

    private val ord = Ordering.by[(Double, Long), (Double, Long)] {
      case (q, id) => (-q, id)
    }

    override def zero: TopKBuf = TopKBuf(Nil)

    override def reduce(b: TopKBuf, in: (String, Double, Long)): TopKBuf = {
      val cand = (in._2, in._3)
      if (b.rows.lengthCompare(cap) < 0)
        TopKBuf((cand :: b.rows).sorted(ord))
      else if (ord.lt(cand, b.rows.last))
        TopKBuf((cand :: b.rows.init).sorted(ord))
      else b
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.rows ++ b.rows).sorted(ord).take(cap))

    override def finish(b: TopKBuf): TopKOut =
      TopKOut(b.rows.length.toLong, b.rows.map(_._2).sum,
        if (b.rows.isEmpty) 0.0 else b.rows.map(_._1).min)

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
  }
}
