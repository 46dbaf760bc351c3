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

  /** A12 trimmed-centroid as a typed Aggregator (same capped buffer as
    * A10/A11). The reference applies A12 to bounded, time-sorted histories
    * (≤100 after dedup), so finish runs the pure algorithm on the buffer's
    * time-sorted points; for groups within the cap this is exactly
    * Elections.trimmedCentroid on the sorted input (parity spec).
    */
  class TrimmedCentroidAgg(cap: Int = 500)
      extends Aggregator[Pt, ElectionBuf, BestLoc] with Serializable {

    private val inner = new BestLocationAgg(cap)

    override def zero: ElectionBuf = inner.zero
    override def reduce(b: ElectionBuf, p: Pt): ElectionBuf = inner.reduce(b, p)
    override def merge(a: ElectionBuf, b: ElectionBuf): ElectionBuf = inner.merge(a, b)

    override def finish(b: ElectionBuf): BestLoc = {
      if (b.count == 0) return BestLoc(0.0, 0.0)
      val sorted = b.pts.sortBy(p => (p.ts, p.lat, p.lng)).take(cap)
      val (lat, lng) = Elections.trimmedCentroid(sorted)
      BestLoc(lat, lng)
    }

    override def bufferEncoder: Encoder[ElectionBuf] = Encoders.product[ElectionBuf]
    override def outputEncoder: Encoder[BestLoc] = Encoders.product[BestLoc]
  }

  /** One input row of the A13 aggregation: a ping joined to its delivery
    * fix (the q41 join shape — every row of a (user, delivery) group
    * carries the same delivery columns).
    */
  case class DelPing(delLat: Double, delLng: Double, delTs: Long,
                     delAcc: Double, pingLat: Double, pingLng: Double,
                     pingAcc: Double, pingTs: Long)

  /** Buffer: capped ping list + exact count + the group's delivery fix. */
  case class RefineBuf(pings: List[Pt], count: Long, delLat: Double,
                       delLng: Double, delTs: Long, delAcc: Double,
                       hasDel: Boolean)

  case class Refined(lat: Double, lng: Double, refined: Boolean)

  /** A13 delivery refinement as a typed Aggregator: capped O(cap) buffer
    * and merge like A10; finish runs cluster → best-cluster → election on
    * the time-sorted pings. Ping histories are bounded upstream (the ±30
    * min range join), so groups within the cap match
    * Elections.refineDeliveryLocation exactly (parity spec).
    */
  class RefineDeliveryAgg(cap: Int = 500, epsM: Int = 150, minCount: Int = 3)
      extends Aggregator[DelPing, RefineBuf, Refined] with Serializable {

    override def zero: RefineBuf =
      RefineBuf(Nil, 0L, 0.0, 0.0, 0L, 0.0, hasDel = false)

    override def reduce(b: RefineBuf, r: DelPing): RefineBuf = {
      val pings =
        if (b.count < cap) Pt(r.pingLat, r.pingLng, r.pingAcc, r.pingTs) :: b.pings
        else b.pings
      RefineBuf(pings, b.count + 1, r.delLat, r.delLng, r.delTs, r.delAcc,
        hasDel = true)
    }

    override def merge(a: RefineBuf, b: RefineBuf): RefineBuf = {
      val del = if (a.hasDel) a else b
      RefineBuf((a.pings ++ b.pings).sortBy(p => (p.ts, p.lat, p.lng)).take(cap),
        a.count + b.count, del.delLat, del.delLng, del.delTs, del.delAcc,
        a.hasDel || b.hasDel)
    }

    override def finish(b: RefineBuf): Refined = {
      if (!b.hasDel) return Refined(0.0, 0.0, refined = false)
      val sorted = b.pings.sortBy(p => (p.ts, p.lat, p.lng))
      val (lat, lng, ok) = Elections.refineDeliveryLocation(
        b.delLat, b.delLng, b.delTs, b.delAcc, sorted, epsM, minCount)
      Refined(lat, lng, ok)
    }

    override def bufferEncoder: Encoder[RefineBuf] = Encoders.product[RefineBuf]
    override def outputEncoder: Encoder[Refined] = Encoders.product[Refined]
  }
}
