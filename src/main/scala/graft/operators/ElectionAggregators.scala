package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import Elections.Pt

/** Typed aggregators (SURVEY.md §2.10) wrapping the election algorithms so
  * they run as real partial/final aggregates — map-side combine keeps the
  * shuffle bounded even when one key has millions of raw rows.
  *
  * Buffer design (the 100-TB consideration): the reference caps useful group
  * state at ≤500 points for the A10 election (BestLatLngCalculator.scala:39-41)
  * and keeps the newest-100 deduped rows (GeoTagOptimizedService.scala:245-250),
  * so the buffer stores at most `cap+1` time-sorted points plus a running
  * total count — merge cost is O(cap) regardless of input size, and the
  * election semantics ("> 500 points → last point") stay exact because we
  * always retain the globally-latest point and the true count.
  */
object ElectionAggregators {

  /** Buffer: up to `cap` earliest-kept time-sorted points + exact count +
    * the latest point seen (for the early-exit paths that return "last").
    */
  case class ElectionBuf(pts: List[Pt], count: Long, latest: Option[Pt])

  case class BestLoc(lat: Double, lng: Double)

  /** A10 best-location as a typed Aggregator over Pt rows. */
  class BestLocationAgg(cap: Int = 500, radiusM: Double = 300.0)
      extends Aggregator[Pt, ElectionBuf, BestLoc] with Serializable {

    override def zero: ElectionBuf = ElectionBuf(Nil, 0L, None)

    // total order (ts, lat, lng): merge-order-independent choice when two
    // distinct points share the max timestamp (matches the specs'
    // sortBy(ts, lat, lng).last expectation)
    private def later(a: Pt, b: Pt): Pt = {
      val ord = Ordering.Tuple3[Long, Double, Double]
      if (ord.gteq((a.ts, a.lat, a.lng), (b.ts, b.lat, b.lng))) a else b
    }

    override def reduce(b: ElectionBuf, p: Pt): ElectionBuf = {
      val latest = b.latest.map(later(_, p)).orElse(Some(p))
      val pts = if (b.count < cap + 1) (p :: b.pts) else b.pts
      ElectionBuf(pts, b.count + 1, latest)
    }

    override def merge(a: ElectionBuf, b: ElectionBuf): ElectionBuf = {
      val latest = (a.latest, b.latest) match {
        case (Some(x), Some(y)) => Some(later(x, y))
        case (x, y)             => x.orElse(y)
      }
      val pts = (a.pts ++ b.pts).sortBy(p => (p.ts, p.lat, p.lng)).take(cap + 1)
      ElectionBuf(pts, a.count + b.count, latest)
    }

    override def finish(b: ElectionBuf): BestLoc = {
      if (b.count == 0) return BestLoc(0.0, 0.0)
      if (b.count < 4 || b.count > cap) {
        val p = b.latest.get
        BestLoc(p.lat, p.lng)
      } else {
        val sorted = b.pts.sortBy(p => (p.ts, p.lat, p.lng))
        val (lat, lng) = Elections.bestLatLng(sorted, radiusM)
        BestLoc(lat, lng)
      }
    }

    override def bufferEncoder: Encoder[ElectionBuf] = Encoders.product[ElectionBuf]
    override def outputEncoder: Encoder[BestLoc] = Encoders.product[BestLoc]
  }

  case class ScoredLoc(lat: Double, lng: Double, confidence: Double)

  /** A11 cluster-score election as a typed Aggregator (same capped-buffer
    * design as A10: the reference applies the election to the deduped,
    * newest-100 history — BestLatLngCalculator.scala:65-121 — so the
    * buffer keeps the cap+1 earliest time-sorted points plus exact count
    * and latest; merge stays O(cap)).
    */
  class ClusterScoreAgg(cap: Int = 500, thresholdM: Double = 200.0)
      extends Aggregator[Pt, ElectionBuf, ScoredLoc] with Serializable {

    private val inner = new BestLocationAgg(cap)

    override def zero: ElectionBuf = inner.zero
    override def reduce(b: ElectionBuf, p: Pt): ElectionBuf = inner.reduce(b, p)
    override def merge(a: ElectionBuf, b: ElectionBuf): ElectionBuf = inner.merge(a, b)

    override def finish(b: ElectionBuf): ScoredLoc = {
      if (b.count == 0) return ScoredLoc(0.0, 0.0, 0.0)
      if (b.count < 4 || b.count > cap) {
        val p = b.latest.get
        ScoredLoc(p.lat, p.lng, 0.0)
      } else {
        val sorted = b.pts.sortBy(p => (p.ts, p.lat, p.lng))
        val (lat, lng, conf) = Elections.clusterScore(sorted, thresholdM)
        ScoredLoc(lat, lng, conf)
      }
    }

    override def bufferEncoder: Encoder[ElectionBuf] = Encoders.product[ElectionBuf]
    override def outputEncoder: Encoder[ScoredLoc] = Encoders.product[ScoredLoc]
  }
}
