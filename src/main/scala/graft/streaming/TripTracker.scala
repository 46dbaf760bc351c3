package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GeoFunctions

/** Geofence trip state machine (SURVEY.md §2.10) as the one genuinely
  * stateful streaming operator: `flatMapGroupsWithState` keyed by trip id.
  *
  * Semantics follow spark-jobs .../service/TripTrackingService.scala:128-190:
  *  - a location is "inside" a geofence when haversine(center, point) <
  *    radius (km); when several match, the LAST in the trip's geofence list
  *    wins (reference iterates and overwrites).
  *  - no match → the synthetic "outer" geofence.
  *  - on state change from lastGeofence L to current C:
  *      C != outer: emit trip_start (if L == src) else geofence_exit
  *                  (if L != outer); then trip_end (if C == dest) else
  *                  geofence_entry.
  *      C == outer: emit trip_start (if L == src) else geofence_exit
  *                  (if L != outer).
  *    then persist C as the new last geofence.
  *
  * Within a micro-batch, events for a key are processed in event-time
  * order (the reference processes in arrival order; we sort by ts for
  * determinism — documented deviation, SURVEY.md §7 known-hard item 2).
  *
  * State per key is one string — bounded, watermark-safe, and the shuffle
  * key (trip id) gives linear scale-out across executors.
  */
object TripTracker {

  val OuterGeofence = "outer"

  case class Geofence(geofenceId: String, lat: Double, lng: Double,
                      radiusKm: Double, kind: String) // kind: src|waypoint|dest

  case class TripConfig(tripId: String, geofences: Seq[Geofence])

  case class Ping(tripId: String, ts: Long, lat: Double, lng: Double)

  case class TripAlert(tripId: String, ts: Long, geofenceId: String,
                       alertType: String)

  case class TripState(lastGeofenceId: String)

  def currentGeofence(cfg: TripConfig, lat: Double, lng: Double): String = {
    var current = OuterGeofence
    cfg.geofences.foreach { g =>
      if (GeoFunctions.haversineKmScala(g.lat, g.lng, lat, lng) < g.radiusKm)
        current = g.geofenceId
    }
    current
  }

  /** Pure transition function: (state, ping) → (newState, alerts). */
  def transition(cfg: TripConfig, last: String, ping: Ping): (String, Seq[TripAlert]) = {
    val current = currentGeofence(cfg, ping.lat, ping.lng)
    if (current == last) (last, Nil)
    else {
      val src = cfg.geofences.find(_.kind == "src").map(_.geofenceId)
      val dest = cfg.geofences.find(_.kind == "dest").map(_.geofenceId)
      val alerts = scala.collection.mutable.ListBuffer[TripAlert]()
      def alert(gid: String, t: String): Unit =
        alerts += TripAlert(ping.tripId, ping.ts, gid, t)
      if (current != OuterGeofence) {
        if (src.contains(last)) alert(last, "trip_start")
        else if (last != OuterGeofence) alert(last, "geofence_exit")
        if (dest.contains(current)) alert(current, "trip_end")
        else alert(current, "geofence_entry")
      } else {
        if (src.contains(last)) alert(last, "trip_start")
        else if (last != OuterGeofence) alert(last, "geofence_exit")
      }
      (current, alerts.toSeq)
    }
  }

  /** Process one key's micro-batch worth of pings against its state. */
  def processKey(cfg: Map[String, TripConfig])(
      tripId: String, pings: Iterator[Ping],
      state: GroupState[TripState]): Iterator[TripAlert] = {
    cfg.get(tripId) match {
      case None => Iterator.empty
      case Some(tc) =>
        var last = state.getOption.map(_.lastGeofenceId)
          .getOrElse(tc.geofences.find(_.kind == "src").map(_.geofenceId)
            .getOrElse(OuterGeofence))
        val out = scala.collection.mutable.ListBuffer[TripAlert]()
        pings.toSeq.sortBy(_.ts).foreach { p =>
          val (next, alerts) = transition(tc, last, p)
          last = next
          out ++= alerts
        }
        state.update(TripState(last))
        out.iterator
    }
  }

  /** Attach the state machine to a streaming Dataset of pings. */
  def alerts(pings: Dataset[Ping], configs: Map[String, TripConfig]): Dataset[TripAlert] = {
    implicit val alertEnc = Encoders.product[TripAlert]
    implicit val stateEnc = Encoders.product[TripState]
    pings.groupByKey(_.tripId)(Encoders.STRING)
      .flatMapGroupsWithState[TripState, TripAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(processKey(configs))
  }
}
