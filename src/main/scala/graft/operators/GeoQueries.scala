package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoFunctions._
import Elections.Pt

/** Geospatial operator surface (SURVEY.md §2.8) + the flagship
  * best-location election pipeline (§3.1 restated Spark-first).
  *
  * The test tables carry no coordinates, so geo queries derive
  * deterministic synthetic lat/lng from integer columns — identical
  * integer→double arithmetic on both engines, so haversine oracles are
  * exact up to rounding.
  */
object GeoQueries {

  type Q = (SparkSession, String) => DataFrame

  /** events + deterministic synthetic coordinates and accuracy. */
  private[graft] def geoEvents(s: SparkSession, dir: String): DataFrame =
    RelationalQueries.ev(s, dir)
      .withColumn("lat", (col("user_id") % 120) - 60 + col("value") / 1000.0)
      .withColumn("lng", (col("event_id") % 340) - 170 + col("value") / 1000.0)
      .withColumn("acc", col("value") % 120.0)

  /** Election-query geometry (q77/q78/q79): user-dependent band spacing
    * (~28-111 m) plus ~1 m jitter so the elections' radius/threshold
    * parameters bind in both directions; accMod controls how many of the
    * acc bands {10,40,70,100,130,...} exist (5 makes the acc<=100
    * qualifying filter of A12 bind; 3 keeps every point qualifying).
    * Integer-mod → double arithmetic, bit-identical across engines.
    */
  private def electionPoints(s: SparkSession, dir: String, accMod: Int): DataFrame =
    RelationalQueries.ev(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"),
        ((col("user_id") % 120) - 60
          + floor(col("value") % 7) / (lit(1000.0) * (lit(1) + col("user_id") % 4))
          + (col("event_id") % 5) / 100000.0).as("lat"),
        ((col("user_id") % 340) - 170
          + (col("event_id") % 11) / (lit(1000.0) * (lit(1) + col("user_id") % 4))
          + floor(col("value") % 13) / 100000.0).as("lng"),
        (floor(col("value") % accMod) * 30.0 + 10.0).as("acc"),
        col("ts_ms"))

  /** Per-user time-sorted point history of the election geometry. */
  private def electionGrouped(s: SparkSession, dir: String, accMod: Int): DataFrame =
    electionPoints(s, dir, accMod)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("ts_ms"), col("lat"), col("lng"), col("acc")))).as("pts"))

  val defs: Map[String, Q] = Map(

    // Haversine distance (pure Column math → codegen) from a fixed center,
    // averaged per event type.
    "q21_haversine_stats" -> ((s, dir) => {
      geoEvents(s, dir)
        .withColumn("dist_km",
          haversineKm(col("lat"), col("lng"), lit(20.0), lit(78.0)))
        .groupBy(col("event_type"))
        .agg(round(avg("dist_km"), 3).as("avg_dist_km"),
          round(min("dist_km"), 3).as("min_dist_km"),
          round(max("dist_km"), 3).as("max_dist_km"))
        .orderBy("event_type")
    }),

    // Geofence containment counts (reference TripTrackingService
    // isInsideGeofences → boolean haversine expression).
    "q22_geofence_hits" -> ((s, dir) => {
      val g = geoEvents(s, dir)
      g.groupBy(col("event_type"))
        .agg(
          sum(when(geofenceContains(col("lat"), col("lng"),
            lit(20.0), lit(78.0), lit(3000.0)), 1).otherwise(0)).as("in_india_3000km"),
          sum(when(geofenceContains(col("lat"), col("lng"),
            lit(48.0), lit(2.0), lit(1000.0)), 1).otherwise(0)).as("in_europe_1000km"),
          sum(when(geofenceContains(col("lat"), col("lng"),
            lit(-30.0), lit(-60.0), lit(1500.0)), 1).otherwise(0)).as("in_sam_1500km"))
        .orderBy("event_type")
    }),

    // Geohash spatial index cells. Encode/decode exactness is pinned by
    // GeoFunctionsSpec against public test vectors, AND the DuckDB oracle
    // re-derives the precision-5 hash with a recursive-CTE interval-
    // halving (25 steps): every interval endpoint is a dyadic rational,
    // so the double math is exact on both engines and the comparison
    // cascade reproduces geohashEncodeScala bit-for-bit.
    //
    // avg_value is the EXACT mean, derived as round(sum,2)/n rather than
    // round(avg,4): values carry 2 decimals, so the true per-cell sum IS
    // a 2-decimal number and round(·,2) only strips double-representation
    // noise (it can never sit on a .005 boundary), after which both
    // engines divide identical doubles by identical counts — bit-equal.
    // round(avg,4) instead LANDS on half-ties (an n=8 cell's true mean
    // has 5 decimals): the first organic-sf1 oracle sweep caught 10 of
    // 265,951 cells flipping ±0.0001 between Spark's BigDecimal HALF_UP
    // (decimal string) and DuckDB's rounding of the raw binary double.
    "q23_geohash_cells" -> ((s, dir) => {
      geoEvents(s, dir)
        .withColumn("cell", geohashEncode(col("lat"), col("lng"), 5))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (round(sum("value"), 2) / count(lit(1))).as("avg_value"))
        .filter(col("n") >= 2)
        .orderBy("cell")
    }),

    // Flagship (§3.1 StreamingAppV3 restated): filter → group per user →
    // time-sorted point list → dedup-and-cap-100 → A10 best-location +
    // A11 cluster-score election. collect_list is an ObjectHashAggregate
    // with map-side partial merge; AFTER the UDF the group state is capped
    // (≤100 after dedup, election skipped >500) exactly like the
    // reference.
    //
    // DECLARED unbounded-group caveat (the one deliberate full-list
    // buffer in the engine): the agg buffer itself holds the COMPLETE
    // per-user point list before dedupAndCap runs, because the exact
    // reference semantics require it — dedup is FIRST-OCCURRENCE over the
    // full time-sorted history, then the cap keeps the TAIL 100
    // (BestLatLngCalculator's deduplicateList-then-takeRight order), so
    // which 100 points survive depends on every earlier duplicate: a
    // pre-capped buffer changes verdicts and breaks the oracle. This
    // matches the reference batch job, which also materializes the merged
    // list per key. At 100 TB a hot key pays O(its history) here; the
    // production forms for unbounded histories are (a) the streaming
    // pipeline (GeotagPipeline / StreamingJobs.bestLocationUpsert), where
    // each group list is bounded by one micro-batch, and (b) the typed
    // O(cap)-buffer ElectionAggregators twins (capped merge state, exact
    // early-exit semantics via latest+count) — parity-pinned against this
    // query's election on the driver corpora in QueriesSpec ("typed
    // aggregator twins") and ElectionsSpec. Oracle-checked END-TO-END with
    // the real vincenty kernel: the WGS84 inverse iteration is replayed
    // op-for-op as a DuckDB recursive CTE (vincentyPairCtes below), so the
    // whole flagship — iterative geodesic included — is hash-checked, not
    // just its haversine twin (q77). Safety measured before wiring in: the
    // election compares d against 300/200 m with ≥57 m margin at sf0.01,
    // the two non-converging near-antipodal pairs oscillate at |Δλ|≈2e-2
    // (never near the 1e-12 exit, so both engines reach the iter=200
    // haversine fallback), and 1e-15 relative λ noise flips zero
    // elections — cross-engine libm ulp differences cannot change the
    // result. The one structural tie — A11's mutual last-pair scores —
    // is made exact by the kernel's endpoint canonicalization
    // (GeoFunctions.vincentyM doc) and resolves by insertion order
    // identically in both engines. Exact semantics additionally pinned
    // by ElectionsSpec.
    "q40_best_location" -> ((s, dir) => bestLocationElection(s, dir, None)),

    // q40's deterministic 1-in-50 user sample — the ORGANIC-SF1 audit
    // twin (the q80-for-q48 pattern: same operator, a restated checkable
    // surface). q40's own oracle replays vincenty per point pair as a
    // recursive CTE and exceeds DuckDB's capacity at sf1 (~1.6G
    // recursion rows; SCALING §6b), so THIS sibling runs the IDENTICAL
    // pipeline over `user_id % 50 = 0` — the full election chain stays
    // hash-checked at every scale the organic tree sweeps, at 1/2500 of
    // the oracle's pair count.
    "q118_election_sample" -> ((s, dir) => bestLocationElection(s, dir, Some(50))),

    // A13 delivery refinement: purchases = deliveries, views = GPS pings;
    // range-join pings within ±30 min of each delivery (replaces the
    // reference's collect-and-filter at DeliveryLocationRefinementService
    // .scala:106), then DBSCAN-cluster + elect. Oracle-checked: at every
    // test SF the ±30 min window yields ≤2 pings per delivery (measured:
    // max 1/2/2 at sf0.001/0.01/0.1), which is below dbscanClusters'
    // minCount=3, so PROVABLY — from the semantics, not the data — no
    // cluster can form and every row is the (delLat, delLng, false)
    // passthrough, independent of any distance. The oracle replays exactly
    // that and POISONS (NULL) any delivery reaching 3 pings, so if the
    // corpus ever grows past the bound the check fails loudly instead of
    // silently passing. The refine path itself is covered by the
    // engineered-geometry election oracles (q78/q79/q81) and
    // ElectionsSpec/RefineDeliveryAgg parity.
    "q41_delivery_refinement" -> ((s, dir) => {
      import s.implicits._
      val g = geoEvents(s, dir)
      val deliveries = g.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("del_id"),
          col("ts_ms").as("del_ts"), col("lat").as("del_lat"),
          col("lng").as("del_lng"), col("acc").as("del_acc"))
      val pings = g.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_ms").as("ping_ts"),
          col("lat").as("ping_lat"), col("lng").as("ping_lng"),
          col("acc").as("ping_acc"))
      // co-partitioned equi-join on user_id + range predicate pushed into
      // the join condition: one shuffle, no cartesian.
      val joined = deliveries.join(pings,
        deliveries("user_id") === pings("user_id") &&
          pings("ping_ts").between(
            deliveries("del_ts") - 1800000L, deliveries("del_ts") + 1800000L))
        .select(deliveries("user_id"), col("del_id"), col("del_ts"),
          col("del_lat"), col("del_lng"), col("del_acc"),
          col("ping_ts"), col("ping_lat"), col("ping_lng"), col("ping_acc"))
      val refined = joined
        .groupBy(col("user_id"), col("del_id"), col("del_ts"),
          col("del_lat"), col("del_lng"), col("del_acc"))
        .agg(sort_array(collect_list(struct(col("ping_ts"), col("ping_lat"),
          col("ping_lng"), col("ping_acc")))).as("pings"))
      val refine = udf { (dLat: Double, dLng: Double, dTs: Long, dAcc: Double,
                          pings: Seq[Row]) =>
        val pts = pings.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        val (lat, lng, ok) = Elections.refineDeliveryLocation(
          dLat, dLng, dTs, dAcc, pts, epsM = 200000, minCount = 3)
        (lat, lng, ok)
      }
      refined
        .withColumn("r", refine(col("del_lat"), col("del_lng"),
          col("del_ts"), col("del_acc"), col("pings")))
        .select(col("del_id"),
          round(col("r._1"), 6).as("refined_lat"),
          round(col("r._2"), 6).as("refined_lng"),
          col("r._3").as("was_refined"),
          size(col("pings")).as("n_pings"))
        .orderBy("del_id")
    }),

    // The deterministic grouping half of the q40 flagship made
    // oracle-checkable: per-user first-occurrence dedup of (lat,lng,acc)
    // + tail cap, run through the REAL Elections.dedupAndCap, summarized
    // as a count and a ts checksum over exactly the kept points. The
    // checksum pins WHICH points survive (the cap keeps the LAST `cap`
    // entries of the time-sorted deduped list), not just how many; the
    // DuckDB oracle recomputes the same semantics relationally (min-ts
    // per triple = first occurrence; rank-desc ≤ cap = the tail). cap=20
    // because the verify corpus tops out at ~40 points/user — the default
    // 100 would never bind and the tail selection would go unchecked.
    // q40's election half stays spec-pinned (vincenty isn't SQL).
    // The flagship election machinery made oracle-checkable end-to-end
    // (reference BestLatLngCalculator.scala:33-163): identical A10
    // neighbor-count/argmax/first-max-wins and A11 score/majority/tie-break
    // code paths as q40 (shared a10Core/a11Core via electBothWith), with
    // the vincenty kernel swapped for closed-form haversine meters — the
    // q21/q22 trick — so DuckDB recomputes the whole election. Geometry is
    // re-derived with user-dependent band spacing (~28-111 m) plus ~1 m
    // jitter so the 300 m radius and 200 m majority threshold both bind in
    // both directions (86/64 confidence split at sf0.01; q40's
    // whole-degree scatter would degenerate to self-counts). cap=20 as in
    // q64 so the tail cap binds at the verify scale. q40/q41 stay as the
    // vincenty twins, spec-pinned.
    "q77_election_haversine" -> ((s, dir) => {
      import s.implicits._
      val grouped = electionGrouped(s, dir, accMod = 3)
      val elect = udf { (rows: Seq[Row]) =>
        val points = rows.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        val deduped = Elections.dedupAndCap(points, cap = 20)
        val ((blat, blng), (slat, slng, conf)) = Elections.electBothWith(deduped,
          (a, b) => haversineMScala(a.lat, a.lng, b.lat, b.lng))
        (deduped.length, blat, blng, slat, slng, conf)
      }
      grouped
        .withColumn("r", elect(col("pts")))
        .select(col("user_id"),
          col("r._1").as("n_points"),
          col("r._2").as("best_lat"),
          col("r._3").as("best_lng"),
          col("r._4").as("score_lat"),
          col("r._5").as("score_lng"),
          col("r._6").as("confidence"))
        .orderBy("user_id")
    }),

    // The remaining election variant oracle-checked: clusterBest (the
    // most-neighbors election with first-inserted tie-break and a
    // percentage majority, reference BestLatLngCalculator.scala:123-163 —
    // the confidence gate A13's refinement uses before falling back to
    // the trimmed centroid). Same haversine-kernel trick and geometry as
    // q77; clusterBestWith shares the exact code path with the vincenty
    // clusterBest that q41 exercises.
    "q79_cluster_best" -> ((s, dir) => {
      import s.implicits._
      val grouped = electionGrouped(s, dir, accMod = 3)
      val elect = udf { (rows: Seq[Row]) =>
        val points = rows.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        val deduped = Elections.dedupAndCap(points, cap = 20)
        val (lat, lng, conf) = Elections.clusterBestWith(deduped,
          (a, b) => haversineMScala(a.lat, a.lng, b.lat, b.lng))
        (deduped.length, lat, lng, conf)
      }
      grouped
        .withColumn("r", elect(col("pts")))
        .select(col("user_id"),
          col("r._1").as("n_points"),
          col("r._2").as("cb_lat"),
          col("r._3").as("cb_lng"),
          col("r._4").as("confidence"))
        .orderBy("user_id")
    }),

    // A13's sequential DBSCAN walk + best-cluster select + election/trim
    // (reference DeliveryLocationRefinementService.scala:133-204),
    // oracle-checked END-TO-END for the first time — q41's corpus cannot
    // form clusters (≤2 pings/window), so the walk itself had no oracle
    // until now. Engineered meridian geometry (lng fixed; lat from the
    // per-user view sequence number in 0.001° ≈ 111.19 m steps, haversine
    // kernel so DuckDB can recompute distances in closed form) drives
    // every branch of the walk: slots 0-2 chain a 3-point cluster at
    // 105.9 m steps, slot 3 is the reference's silent-drop middle case
    // (167.2 m > eps=150 from the head, 44.5 m ≤ eps from the first),
    // slot 7 opens a cluster that dies below minCount=3 (discard), slots
    // 8-12 chain five points at 145.4-148.1 m (joinable, but pairwise
    // >200 m beyond immediate neighbors → clusterBest confidence 0 → the
    // A12 trim fallback). Deliveries take both bestCluster branches via
    // acc: ≤100 → nearest-centroid ≤100 m (slot-offsets 0.2/13.5/29.0
    // land 83.6/50.3/70.3 m from the c1/c2/c4 centroids; 7.0 lands >100 m
    // from everything → unrefined WITH clusters present), >100 →
    // nearest-avgTs (pure integer math). All spacings are asymmetric so
    // no distance tie exists anywhere (measured gaps ≥1 m vs ~1e-9 m
    // cross-engine noise). n_clusters and via_election are emitted so the
    // oracle pins which branch produced every row, not just the location.
    "q81_refine_walk" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = RelationalQueries.ev(s, dir)
      // every offset is a multiple of 0.004 milli-degrees, so any subset
      // mean over n ∈ {2,4,5} (trim centroids, fallback means) terminates
      // within 6 decimals and round(·,6) is the identity — no mean can
      // land on a rounding half-boundary where engine ulp noise decides
      // the digit (observed before this: 14/20084 sf0.1 rows flipped the
      // 6th decimal). /3 means either terminate or are non-terminating,
      // which is never a half-boundary. Margins + subset tie audit:
      // every trim sort gap ≥0.89 m, every threshold margin ≥1.89 m.
      val slotOffsets = array(Seq(0.0, 0.952, 1.904, 0.4, 13.0, 13.952,
        14.904, 0.68, 27.0, 28.308, 29.624, 30.948, 32.28).map(lit): _*)
      val wv = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .withColumn("rn", row_number().over(wv))
        .withColumn("off", element_at(slotOffsets, ((col("rn") - 1) % 13) + 1))
        .select(col("user_id"),
          ((col("user_id") % 90) - 45 + col("off") / 1000.0).as("lat"),
          lit(10.0).as("lng"),
          (col("value") % 120.0).as("acc"),
          col("ts_ms"))
      val grouped = views
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(
          col("ts_ms"), col("lat"), col("lng"), col("acc")))).as("pings"))
      val delOffsets = array(Seq(0.2, 7.0, 13.5, 29.0).map(lit): _*)
      val dels = ev.filter(col("event_type") === "purchase")
        .withColumn("prn", row_number().over(wv))
        .withColumn("doff", element_at(delOffsets, ((col("prn") - 1) % 4) + 1))
        .select(col("user_id"), col("event_id").as("del_id"),
          col("ts_ms").as("del_ts"),
          ((col("user_id") % 90) - 45 + col("doff") / 1000.0).as("del_lat"),
          lit(10.0).as("del_lng"),
          (col("value") % 120.0).as("del_acc"))
      // one tiny row per user on the build side → broadcast; deliveries
      // stream against it with no shuffle of the fact side.
      val refine = udf { (dLat: Double, dLng: Double, dTs: Long, dAcc: Double,
                          pings: Seq[Row]) =>
        val pts = pings.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        Elections.refineDeliveryLocationWith(dLat, dLng, dTs, dAcc, pts,
          haversineMScala, epsM = 150, minCount = 3)
      }
      dels.join(broadcast(grouped), "user_id")
        .withColumn("r", refine(col("del_lat"), col("del_lng"),
          col("del_ts"), col("del_acc"), col("pings")))
        .select(col("del_id"),
          round(col("r._1"), 6).as("refined_lat"),
          round(col("r._2"), 6).as("refined_lng"),
          col("r._3").as("was_refined"),
          col("r._4").as("n_clusters"),
          col("r._5").as("via_election"),
          size(col("pings")).as("n_pings"))
        .orderBy("del_id")
    }),

    // A12 trimmed centroid as its own oracle-checked entry (reference
    // BestLatLngCalculator.scala:165-198; previously exercised only inside
    // q41's A13 composite): per-user dedup+cap(20) history → iterative
    // drop-worst-10%-while-mean-distance>25m centroid, haversine kernel so
    // the DuckDB oracle can replay the loop as a recursive CTE carrying
    // the point list (sort key (distance, position) = Scala's stable
    // sortBy; drop count = greatest(floor(n*0.1),1) = max(n*0.1,1).toInt).
    // acc bands {10,40,70,100,130} make the acc<=100 qualifying filter
    // bind (~1/5 of points excluded). q41 keeps the vincenty twin.
    "q78_trimmed_centroid" -> ((s, dir) => {
      import s.implicits._
      val grouped = electionGrouped(s, dir, accMod = 5)
      val trim = udf { (rows: Seq[Row]) =>
        val points = rows.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        val deduped = Elections.dedupAndCap(points, cap = 20)
        val (clat, clng) = Elections.trimmedCentroidWith(deduped, haversineMScala)
        (deduped.length, clat, clng)
      }
      grouped
        .withColumn("r", trim(col("pts")))
        .select(col("user_id"),
          col("r._1").as("n_points"),
          col("r._2").as("c_lat"),
          col("r._3").as("c_lng"))
        .orderBy("user_id")
    }),

    "q64_dedup_cap_counts" -> ((s, dir) => {
      import s.implicits._
      val pts = geoEvents(s, dir)
        .filter(col("event_type").isin("click", "purchase") &&
          col("acc") > 0 && col("acc") < 200)
        .select(col("user_id"), col("lat"), col("lng"), col("acc"),
          col("ts_ms"))
      val grouped = pts
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(
          col("ts_ms"), col("lat"), col("lng"), col("acc")))).as("pts"))
      val stats = udf { (rows: Seq[Row]) =>
        val points = rows.map(r => Pt(r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(0)))
        val kept = Elections.dedupAndCap(points, cap = 20)
        (kept.length, kept.map(_.ts).sum)
      }
      grouped
        .withColumn("r", stats(col("pts")))
        .select(col("user_id"),
          col("r._1").as("n_points"),
          col("r._2").as("ts_checksum"))
        .orderBy("user_id")
    })
  )

  /** q40's flagship election pipeline (and q118's sampled audit twin —
    * `sampleMod` keeps every user whose id ≡ 0 mod it). One body so the
    * twin can never drift from the flagship.
    */
  private def bestLocationElection(s: SparkSession, dir: String,
      sampleMod: Option[Int]): DataFrame = {
    val pts = geoEvents(s, dir)
      .filter(col("event_type").isin("click", "purchase") &&
        col("acc") > 0 && col("acc") < 200)
      .filter(sampleMod.fold(lit(true))(m => col("user_id") % m === 0))
      .select(col("user_id"), col("lat"), col("lng"), col("acc"),
        col("ts_ms"))
    val grouped = pts
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("ts_ms"), col("lat"), col("lng"), col("acc")))).as("pts"))
    val elect = udf { (pts: Seq[Row]) =>
      val points = pts.map(r => Pt(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(0)))
      val deduped = Elections.dedupAndCap(points)
      // one shared distance matrix for both elections (parity-spec'd)
      val ((blat, blng), (slat, slng, conf)) = Elections.electBoth(deduped)
      (deduped.length, blat, blng, slat, slng, conf)
    }
    grouped
      .withColumn("r", elect(col("pts")))
      .select(col("user_id"),
        col("r._1").as("n_points"),
        col("r._2").as("best_lat"),
        col("r._3").as("best_lng"),
        col("r._4").as("score_lat"),
        col("r._5").as("score_lng"),
        col("r._6").as("confidence"))
      .orderBy("user_id")
  }

  /** Shared CTE prefix of the q77/q79 election oracles: dedup+cap exactly
    * as q64 over the accMod=3 geometry, ordered pairwise haversine meters
    * spelled op-for-op like haversineMScala (self pairs included, as in
    * a10Core), per-location first/last indices, and cross-location
    * neighbor counts at d<=200 (the definition both A11 and clusterBest
    * share).
    */
  private val electionCte: String =
    """WITH g AS (
      |  SELECT user_id,
      |    (user_id % 120) - 60 + floor(value % 7) / (1000.0 * (1 + user_id % 4)) + (event_id % 5) / 100000.0 AS lat,
      |    (user_id % 340) - 170 + (event_id % 11) / (1000.0 * (1 + user_id % 4)) + floor(value % 13) / 100000.0 AS lng,
      |    floor(value % 3) * 30.0 + 10.0 AS acc,
      |    epoch_ms(ts) AS ts_ms
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase')),
      |f AS (
      |  SELECT user_id, lat, lng, acc, min(ts_ms) AS fts
      |  FROM g GROUP BY 1, 2, 3, 4),
      |r AS (
      |  SELECT user_id, lat, lng, acc, fts,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY fts DESC, lat DESC, lng DESC, acc DESC) AS rnd
      |  FROM f),
      |idx AS (
      |  SELECT user_id, lat, lng, fts, acc,
      |    row_number() OVER (PARTITION BY user_id ORDER BY fts, lat, lng, acc) AS i
      |  FROM r WHERE rnd <= 20),
      |un AS (SELECT user_id, max(i) AS n FROM idx GROUP BY 1),
      |p AS (
      |  SELECT a.user_id, a.i AS i, b.i AS j,
      |    a.lat AS alat, a.lng AS alng,
      |    (a.lat = b.lat AND a.lng = b.lng) AS same_loc,
      |    (2 * 6371.0 * asin(sqrt(
      |      pow(sin(radians(b.lat - a.lat) / 2), 2) +
      |      cos(radians(a.lat)) * cos(radians(b.lat)) *
      |      pow(sin(radians(b.lng - a.lng) / 2), 2)))) * 1000.0 AS d
      |  FROM idx a JOIN idx b ON a.user_id = b.user_id),
      |locs AS (
      |  SELECT user_id, lat, lng, min(i) AS first_i, max(i) AS last_i
      |  FROM idx GROUP BY 1, 2, 3),
      |nbr AS (
      |  SELECT l.user_id, l.lat, l.lng,
      |    sum(CASE WHEN NOT p.same_loc AND p.d <= 200.0 THEN 1 ELSE 0 END) AS nb
      |  FROM locs l JOIN p ON p.user_id = l.user_id AND p.alat = l.lat AND p.alng = l.lng
      |  GROUP BY 1, 2, 3)""".stripMargin

  /** haversineMScala spelled op-for-op as a SQL snippet (the q77/q78
    * spelling): (lat1,lng1,lat2,lng2) argument order matters because the
    * Scala kernel calls are directional (dLat = lat2 − lat1).
    */
  private def havM(lat1: String, lng1: String, lat2: String, lng2: String): String =
    s"""(2 * 6371.0 * asin(sqrt(
       |      pow(sin(radians($lat2 - $lat1) / 2), 2) +
       |      cos(radians($lat1)) * cos(radians($lat2)) *
       |      pow(sin(radians($lng2 - $lng1) / 2), 2)))) * 1000.0""".stripMargin

  /** `(SemiMajor - SemiMinor) / SemiMajor` with the exact literals of
    * `GeoFunctions.Flattening`, cast to DOUBLE (DuckDB parses decimal
    * literals as DECIMAL, which silently truncates recursive-CTE state —
    * the seed columns below cast for the same reason).
    */
  private val FlatSql = "((6378137.0::DOUBLE - 6356752.31420::DOUBLE) / 6378137.0::DOUBLE)"

  /** The vincenty kernel replayed in SQL: expects a CTE `idx(user_id, i,
    * lat, lng)` of per-user indexed points and emits `p(user_id, i, j,
    * alat, alng, same_loc, d)` — every ordered pair (self included) with
    * its `GeoFunctions.vincentyM` distance in meters, computed op-for-op:
    * the zero-latitude 1.0e7 sentinel and the identical-point 0.0 early
    * returns (`ptriv`), then the iterative inverse as a recursive CTE
    * (`vit`) whose rows carry the loop state (λ, λ_prev, iter, sinSigma,
    * cosSigma, σ, cos²α, cos2σм) after each iteration — seeds mirror
    * λ=L, λ_prev=Double.MaxValue; the recursive term applies one loop body
    * (layered derived tables stand in for the Scala locals) under the
    * exact exit condition |λ−λ'|>1e-12 ∧ iter<200, with the sinSigma==0 →
    * 0.0 early return carried as a stop flag. The terminal row per pair
    * (max iter) then yields the distance: 0 if the flag fired, the
    * haversine-meters fallback if iter hit 200 (non-convergent
    * near-antipodal pairs — both engines reach it, see q40's notes), else
    * the ellipsoid arc B·A·(σ−Δσ) with `toRadians` spelled `x/180*pi()`
    * exactly as `java.lang.Math` computes it. λ trajectories verified
    * bit-for-bit equal to the JVM's for converging pairs before wiring in.
    */
  private val vincentyPairCtes: String =
    s"""pb AS (
       |  SELECT a.user_id, a.i AS i, b.i AS j, a.lat AS alat, a.lng AS alng,
       |    b.lat AS blat, b.lng AS blng,
       |    (a.lat = b.lat AND a.lng = b.lng) AS same_loc
       |  FROM idx a JOIN idx b ON a.user_id = b.user_id),
       |ptriv AS (
       |  SELECT user_id, i, j, alat, alng, same_loc,
       |    CASE WHEN alat = 0 OR blat = 0 THEN 1.0e7 ELSE 0.0 END AS d
       |  FROM pb WHERE alat = 0 OR blat = 0 OR (alat = blat AND alng = blng)),
       |pc AS (
       |  SELECT user_id, i, j, alat, alng, same_loc,
       |    CASE WHEN (blat < alat) OR (blat = alat AND blng < alng)
       |         THEN blat ELSE alat END AS clat1,
       |    CASE WHEN (blat < alat) OR (blat = alat AND blng < alng)
       |         THEN blng ELSE alng END AS clng1,
       |    CASE WHEN (blat < alat) OR (blat = alat AND blng < alng)
       |         THEN alat ELSE blat END AS clat2,
       |    CASE WHEN (blat < alat) OR (blat = alat AND blng < alng)
       |         THEN alng ELSE blng END AS clng2
       |  FROM pb
       |  WHERE NOT (alat = 0 OR blat = 0 OR (alat = blat AND alng = blng))),
       |vseed AS (
       |  SELECT user_id, i, j, alat, alng, clat1, clng1, clat2, clng2, same_loc,
       |    ((clng2 - clng1) / 180.0) * pi() AS bigl,
       |    sin(atan((1 - $FlatSql) * tan((clat1 / 180.0) * pi()))) AS su1,
       |    cos(atan((1 - $FlatSql) * tan((clat1 / 180.0) * pi()))) AS cu1,
       |    sin(atan((1 - $FlatSql) * tan((clat2 / 180.0) * pi()))) AS su2,
       |    cos(atan((1 - $FlatSql) * tan((clat2 / 180.0) * pi()))) AS cu2
       |  FROM pc),
       |vit AS (
       |  SELECT user_id, i, j, alat, alng, clat1, clng1, clat2, clng2, same_loc, bigl,
       |    su1, cu1, su2, cu2,
       |    bigl AS lam, 1.7976931348623157e308 AS lamp, 0 AS iter,
       |    0.0::DOUBLE AS ss, 0.0::DOUBLE AS cs, 0.0::DOUBLE AS sg,
       |    0.0::DOUBLE AS csqa, 0.0::DOUBLE AS c2sm,
       |    FALSE AS szero
       |  FROM vseed
       |  UNION ALL
       |  SELECT user_id, i, j, alat, alng, clat1, clng1, clat2, clng2, same_loc, bigl,
       |    su1, cu1, su2, cu2,
       |    CASE WHEN ss2 = 0 THEN lam ELSE
       |      bigl + (((1 - cc) * $FlatSql) * sa) *
       |        (sg2 + (cc * ss2) * (c2m + (cc * cs2) * (-1 + ((2 * c2m) * c2m))))
       |    END AS lam,
       |    lam AS lamp,
       |    iter + 1 AS iter,
       |    ss2 AS ss, cs2 AS cs, sg2 AS sg, ca2 AS csqa, c2m AS c2sm,
       |    (ss2 = 0) AS szero
       |  FROM (
       |    SELECT l3.*,
       |      CASE WHEN ca2 = 0 THEN 0.0
       |           ELSE cs2 - (((2 * su1) * su2) / ca2) END AS c2m,
       |      (($FlatSql / 16) * ca2) * (4 + $FlatSql * (4 - (3 * ca2))) AS cc
       |    FROM (
       |      SELECT l2.*, atan2(ss2, cs2) AS sg2, 1 - (sa * sa) AS ca2
       |      FROM (
       |        SELECT l1.*,
       |          (su1 * su2) + ((cu1 * cu2) * cl) AS cs2,
       |          CASE WHEN ss2 = 0 THEN 0.0
       |               ELSE ((cu1 * cu2) * sl) / ss2 END AS sa
       |        FROM (
       |          SELECT l0.*,
       |            sqrt(pow(cu2 * sl, 2) +
       |                 pow((cu1 * su2) - ((su1 * cu2) * cl), 2)) AS ss2
       |          FROM (
       |            SELECT vit.*, sin(lam) AS sl, cos(lam) AS cl
       |            FROM vit
       |            WHERE (NOT szero) AND abs(lam - lamp) > 1e-12 AND iter < 200
       |          ) l0
       |        ) l1
       |      ) l2
       |    ) l3
       |  ) l4),
       |vterm AS (
       |  SELECT * FROM (
       |    SELECT vit.*,
       |      row_number() OVER (PARTITION BY user_id, i, j ORDER BY iter DESC) AS trk
       |    FROM vit) t WHERE trk = 1),
       |vf1 AS (
       |  SELECT *,
       |    (csqa * ((6378137.0::DOUBLE * 6378137.0::DOUBLE) -
       |             (6356752.31420::DOUBLE * 6356752.31420::DOUBLE)))
       |    / (6356752.31420::DOUBLE * 6356752.31420::DOUBLE) AS usq
       |  FROM vterm),
       |vf2 AS (
       |  SELECT *,
       |    1 + (usq / 16384) * (4096 + usq * (-768 + usq * (320 - (175 * usq)))) AS aa,
       |    (usq / 1024) * (256 + usq * (-128 + usq * (74 - (47 * usq)))) AS bb
       |  FROM vf1),
       |vf3 AS (
       |  SELECT *,
       |    (bb * ss) * (c2sm + (bb / 4) *
       |      ((cs * (-1 + ((2 * c2sm) * c2sm))) -
       |       ((((bb / 6) * c2sm) * (-3 + ((4 * ss) * ss))) *
       |        (-3 + ((4 * c2sm) * c2sm))))) AS dsig
       |  FROM vf2),
       |vdist AS (
       |  SELECT user_id, i, j, alat, alng, same_loc,
       |    CASE WHEN szero THEN 0.0
       |         WHEN iter >= 200 THEN
       |           ((2 * 6371.0) * asin(sqrt(
       |             pow(sin((((clat2 - clat1) / 180.0) * pi()) / 2), 2) +
       |             (cos((clat1 / 180.0) * pi()) * cos((clat2 / 180.0) * pi())) *
       |             pow(sin((((clng2 - clng1) / 180.0) * pi()) / 2), 2)))) * 1000.0
       |         ELSE (6356752.31420::DOUBLE * aa) * (sg - dsig) END AS d
       |  FROM vf3),
       |p AS (SELECT * FROM ptriv UNION ALL SELECT * FROM vdist)""".stripMargin

  /** q40's election replayed with the REAL vincenty kernel (see
    * vincentyPairCtes): same dedup+cap prefix as q64 (cap 100 here),
    * then the identical A10/A11 relational tail as q77 — plus the
    * n>500 A10 guard q40's cap makes reachable in principle. `pred` is
    * prepended to the event filter: "" for the flagship, the 1-in-50
    * user sample for q118's organic-sf1 audit twin.
    */
  private def electionVincentyOracle(pred: String): String =
      (s"""WITH RECURSIVE g AS (
          |  SELECT user_id,
          |    (user_id % 120) - 60 + value / 1000.0 AS lat,
          |    (event_id % 340) - 170 + value / 1000.0 AS lng,
          |    value % 120.0 AS acc,
          |    epoch_ms(ts) AS ts_ms
          |  FROM events
          |  WHERE ${pred}event_type IN ('click', 'purchase')
          |    AND value % 120.0 > 0 AND value % 120.0 < 200),
          |f AS (
          |  SELECT user_id, lat, lng, acc, min(ts_ms) AS fts
          |  FROM g GROUP BY 1, 2, 3, 4),
          |r AS (
          |  SELECT user_id, lat, lng, acc, fts,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY fts DESC, lat DESC, lng DESC, acc DESC) AS rnd
          |  FROM f),
          |idx AS (
          |  SELECT user_id, lat, lng, fts, acc,
          |    row_number() OVER (PARTITION BY user_id ORDER BY fts, lat, lng, acc) AS i
          |  FROM r WHERE rnd <= 100),
          |un AS (SELECT user_id, max(i) AS n FROM idx GROUP BY 1),
          |locs AS (
          |  SELECT user_id, lat, lng, min(i) AS first_i, max(i) AS last_i
          |  FROM idx GROUP BY 1, 2, 3),
          |""".stripMargin + vincentyPairCtes +
        """,
          |nbr AS (
          |  SELECT l.user_id, l.lat, l.lng,
          |    sum(CASE WHEN NOT p.same_loc AND p.d <= 200.0 THEN 1 ELSE 0 END) AS nb
          |  FROM locs l JOIN p ON p.user_id = l.user_id AND p.alat = l.lat AND p.alng = l.lng
          |  GROUP BY 1, 2, 3),
          |c10 AS (
          |  SELECT user_id, i, sum(CASE WHEN d < 300.0 THEN 1 ELSE 0 END) AS cnt
          |  FROM p GROUP BY 1, 2),
          |m10 AS (SELECT user_id, max(cnt) AS mc FROM c10 GROUP BY 1),
          |w10 AS (
          |  SELECT c10.user_id, min(i) AS wi
          |  FROM c10 JOIN m10 ON c10.user_id = m10.user_id AND c10.cnt = m10.mc
          |  GROUP BY 1),
          |oth AS (
          |  SELECT l.user_id, l.lat, l.lng, max(x.i) AS last_other
          |  FROM locs l JOIN idx x ON x.user_id = l.user_id
          |    AND NOT (x.lat = l.lat AND x.lng = l.lng)
          |  GROUP BY 1, 2, 3),
          |sc AS (
          |  SELECT l.user_id, l.lat, l.lng, l.first_i,
          |    CASE WHEN o.last_other IS NULL THEN 0.0 ELSE 1.0 / (1.0 + pd.d) END AS score
          |  FROM locs l
          |  LEFT JOIN oth o ON o.user_id = l.user_id AND o.lat = l.lat AND o.lng = l.lng
          |  LEFT JOIN p pd ON pd.user_id = l.user_id AND pd.i = l.last_i AND pd.j = o.last_other),
          |ms AS (SELECT user_id, max(score) AS mx FROM sc GROUP BY 1),
          |cand AS (
          |  SELECT sc.user_id, sc.lat, sc.lng, sc.first_i, nbr.nb, un.n,
          |    CASE WHEN nbr.nb >= un.n // 2 THEN 1 ELSE 0 END AS qual
          |  FROM sc
          |  JOIN ms ON sc.user_id = ms.user_id AND sc.score = ms.mx
          |  JOIN nbr ON nbr.user_id = sc.user_id AND nbr.lat = sc.lat AND nbr.lng = sc.lng
          |  JOIN un ON un.user_id = sc.user_id),
          |w11 AS (
          |  SELECT user_id, lat, lng,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY qual DESC, CASE WHEN qual = 1 THEN nb ELSE 0 END DESC, first_i ASC) AS rk
          |  FROM cand),
          |conf AS (SELECT user_id, max(qual) AS q FROM cand GROUP BY 1),
          |lastp AS (
          |  SELECT idx.user_id, idx.lat, idx.lng
          |  FROM idx JOIN un ON idx.user_id = un.user_id AND idx.i = un.n),
          |b10 AS (
          |  SELECT w10.user_id, idx.lat, idx.lng
          |  FROM w10 JOIN idx ON idx.user_id = w10.user_id AND idx.i = w10.wi)
          |SELECT un.user_id,
          |  CAST(un.n AS INT) AS n_points,
          |  CASE WHEN un.n < 4 OR un.n > 500 THEN lastp.lat ELSE b10.lat END AS best_lat,
          |  CASE WHEN un.n < 4 OR un.n > 500 THEN lastp.lng ELSE b10.lng END AS best_lng,
          |  CASE WHEN un.n < 3 THEN lastp.lat ELSE w.lat END AS score_lat,
          |  CASE WHEN un.n < 3 THEN lastp.lng ELSE w.lng END AS score_lng,
          |  CASE WHEN un.n < 3 THEN 0.0 ELSE CAST(conf.q AS DOUBLE) END AS confidence
          |FROM un
          |JOIN lastp ON lastp.user_id = un.user_id
          |LEFT JOIN b10 ON b10.user_id = un.user_id
          |LEFT JOIN (SELECT user_id, lat, lng FROM w11 WHERE rk = 1) w ON w.user_id = un.user_id
          |LEFT JOIN conf ON conf.user_id = un.user_id
          |ORDER BY un.user_id""".stripMargin)

  val oracles: Map[String, String] = Map(
    "q40_best_location" -> electionVincentyOracle(""),
    "q118_election_sample" -> electionVincentyOracle("user_id % 50 = 0 AND "),

    // q41's passthrough bound (see the query's notes): ≤2 pings per
    // delivery at every test SF < minCount=3, so the output is provably
    // (delLat, delLng, false) per delivery with ≥1 windowed ping. The
    // n_pings >= 3 poison keeps this oracle honest: growth past the bound
    // fails the compare loudly rather than silently passing.
    "q41_delivery_refinement" ->
      """WITH d AS (
        |  SELECT user_id, event_id AS del_id, epoch_ms(ts) AS del_ts,
        |    (user_id % 120) - 60 + value / 1000.0 AS del_lat,
        |    (event_id % 340) - 170 + value / 1000.0 AS del_lng
        |  FROM events WHERE event_type = 'purchase'),
        |pg AS (SELECT user_id, epoch_ms(ts) AS ping_ts
        |       FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT d.del_id, d.del_lat, d.del_lng, count(*) AS n_pings
        |  FROM d JOIN pg ON pg.user_id = d.user_id
        |    AND pg.ping_ts BETWEEN d.del_ts - 1800000 AND d.del_ts + 1800000
        |  GROUP BY 1, 2, 3)
        |SELECT del_id,
        |  CASE WHEN n_pings >= 3 THEN NULL ELSE round(del_lat, 6) END AS refined_lat,
        |  CASE WHEN n_pings >= 3 THEN NULL ELSE round(del_lng, 6) END AS refined_lng,
        |  CASE WHEN n_pings >= 3 THEN NULL ELSE FALSE END AS was_refined,
        |  CAST(n_pings AS INT) AS n_pings
        |FROM j ORDER BY del_id""".stripMargin,

    "q21_haversine_stats" ->
      """WITH g AS (
        |  SELECT event_type,
        |    2 * 6371.0 * asin(sqrt(
        |      pow(sin(radians(((user_id % 120) - 60 + value / 1000.0) - 20.0) / 2), 2) +
        |      cos(radians(20.0)) * cos(radians((user_id % 120) - 60 + value / 1000.0)) *
        |      pow(sin(radians(((event_id % 340) - 170 + value / 1000.0) - 78.0) / 2), 2)
        |    )) AS dist_km
        |  FROM events)
        |SELECT event_type, round(avg(dist_km), 3) AS avg_dist_km,
        |  round(min(dist_km), 3) AS min_dist_km,
        |  round(max(dist_km), 3) AS max_dist_km
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_geofence_hits" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (user_id % 120) - 60 + value / 1000.0 AS lat,
        |    (event_id % 340) - 170 + value / 1000.0 AS lng
        |  FROM events),
        |d AS (
        |  SELECT event_type,
        |    2 * 6371.0 * asin(sqrt(pow(sin(radians(20.0 - lat) / 2), 2) +
        |      cos(radians(lat)) * cos(radians(20.0)) * pow(sin(radians(78.0 - lng) / 2), 2))) AS d1,
        |    2 * 6371.0 * asin(sqrt(pow(sin(radians(48.0 - lat) / 2), 2) +
        |      cos(radians(lat)) * cos(radians(48.0)) * pow(sin(radians(2.0 - lng) / 2), 2))) AS d2,
        |    2 * 6371.0 * asin(sqrt(pow(sin(radians(-30.0 - lat) / 2), 2) +
        |      cos(radians(lat)) * cos(radians(-30.0)) * pow(sin(radians(-60.0 - lng) / 2), 2))) AS d3
        |  FROM g)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN d1 < 3000.0 THEN 1 ELSE 0 END) AS BIGINT) AS in_india_3000km,
        |  CAST(sum(CASE WHEN d2 < 1000.0 THEN 1 ELSE 0 END) AS BIGINT) AS in_europe_1000km,
        |  CAST(sum(CASE WHEN d3 < 1500.0 THEN 1 ELSE 0 END) AS BIGINT) AS in_sam_1500km
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // first occurrence of a (lat,lng,acc) triple in the time-sorted list
    // = the row with that triple's minimum ts (rows sharing a triple
    // differ only in ts); the deduped list is ordered by (first_ts, lat,
    // lng, acc) — the struct sort order — so takeRight(20) = the 20
    // largest under that order = rank-desc ≤ 20.
    "q64_dedup_cap_counts" ->
      """WITH g AS (
        |  SELECT user_id,
        |    (user_id % 120) - 60 + value / 1000.0 AS lat,
        |    (event_id % 340) - 170 + value / 1000.0 AS lng,
        |    value % 120.0 AS acc,
        |    epoch_ms(ts) AS ts_ms
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |f AS (
        |  SELECT user_id, lat, lng, acc, min(ts_ms) AS fts
        |  FROM g WHERE acc > 0 AND acc < 200
        |  GROUP BY 1, 2, 3, 4),
        |r AS (
        |  SELECT user_id, fts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY fts DESC, lat DESC, lng DESC, acc DESC) AS rn
        |  FROM f)
        |SELECT user_id, CAST(count(*) AS INT) AS n_points,
        |  CAST(sum(fts) AS BIGINT) AS ts_checksum
        |FROM r WHERE rn <= 20 GROUP BY 1 ORDER BY 1""".stripMargin,

    // The election recomputed relationally: dedup+cap exactly as q64, then
    // pairwise haversine meters over the kept points (ordered pairs incl.
    // self, spelled op-for-op like haversineMScala). A10 = min index among
    // max d<300 counts (self included, as in a10Core). A11 per distinct
    // (lat,lng) location: score = 1/(1+d(last index of the location, last
    // index of any OTHER location)) — the reference's per-neighbor
    // overwrite leaves exactly that pairing — neighbors = ordered pairs at
    // d<=200 to other locations; winner among max-score locations = max
    // neighbors among those with >= floor(n/2), insertion-order tie-break,
    // else the first-inserted max-score location; confidence 1.0 iff any
    // location reached the majority. Fallbacks (n<4 / n<3 → last point)
    // mirror the Scala guards.
    "q77_election_haversine" -> (electionCte +
      """,
        |c10 AS (
        |  SELECT user_id, i, sum(CASE WHEN d < 300.0 THEN 1 ELSE 0 END) AS cnt
        |  FROM p GROUP BY 1, 2),
        |m10 AS (SELECT user_id, max(cnt) AS mc FROM c10 GROUP BY 1),
        |w10 AS (
        |  SELECT c10.user_id, min(i) AS wi
        |  FROM c10 JOIN m10 ON c10.user_id = m10.user_id AND c10.cnt = m10.mc
        |  GROUP BY 1),
        |oth AS (
        |  SELECT l.user_id, l.lat, l.lng, max(x.i) AS last_other
        |  FROM locs l JOIN idx x ON x.user_id = l.user_id
        |    AND NOT (x.lat = l.lat AND x.lng = l.lng)
        |  GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT l.user_id, l.lat, l.lng, l.first_i,
        |    CASE WHEN o.last_other IS NULL THEN 0.0 ELSE 1.0 / (1.0 + pd.d) END AS score
        |  FROM locs l
        |  LEFT JOIN oth o ON o.user_id = l.user_id AND o.lat = l.lat AND o.lng = l.lng
        |  LEFT JOIN p pd ON pd.user_id = l.user_id AND pd.i = l.last_i AND pd.j = o.last_other),
        |ms AS (SELECT user_id, max(score) AS mx FROM sc GROUP BY 1),
        |cand AS (
        |  SELECT sc.user_id, sc.lat, sc.lng, sc.first_i, nbr.nb, un.n,
        |    CASE WHEN nbr.nb >= un.n // 2 THEN 1 ELSE 0 END AS qual
        |  FROM sc
        |  JOIN ms ON sc.user_id = ms.user_id AND sc.score = ms.mx
        |  JOIN nbr ON nbr.user_id = sc.user_id AND nbr.lat = sc.lat AND nbr.lng = sc.lng
        |  JOIN un ON un.user_id = sc.user_id),
        |w11 AS (
        |  SELECT user_id, lat, lng,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY qual DESC, CASE WHEN qual = 1 THEN nb ELSE 0 END DESC, first_i ASC) AS rk
        |  FROM cand),
        |conf AS (SELECT user_id, max(qual) AS q FROM cand GROUP BY 1),
        |lastp AS (
        |  SELECT idx.user_id, idx.lat, idx.lng
        |  FROM idx JOIN un ON idx.user_id = un.user_id AND idx.i = un.n),
        |b10 AS (
        |  SELECT w10.user_id, idx.lat, idx.lng
        |  FROM w10 JOIN idx ON idx.user_id = w10.user_id AND idx.i = w10.wi)
        |SELECT un.user_id,
        |  CAST(un.n AS INT) AS n_points,
        |  CASE WHEN un.n < 4 THEN lastp.lat ELSE b10.lat END AS best_lat,
        |  CASE WHEN un.n < 4 THEN lastp.lng ELSE b10.lng END AS best_lng,
        |  CASE WHEN un.n < 3 THEN lastp.lat ELSE w.lat END AS score_lat,
        |  CASE WHEN un.n < 3 THEN lastp.lng ELSE w.lng END AS score_lng,
        |  CASE WHEN un.n < 3 THEN 0.0 ELSE CAST(conf.q AS DOUBLE) END AS confidence
        |FROM un
        |JOIN lastp ON lastp.user_id = un.user_id
        |LEFT JOIN b10 ON b10.user_id = un.user_id
        |LEFT JOIN (SELECT user_id, lat, lng FROM w11 WHERE rk = 1) w ON w.user_id = un.user_id
        |LEFT JOIN conf ON conf.user_id = un.user_id
        |ORDER BY un.user_id""".stripMargin),

    // clusterBest: winner = most cross-location neighbors, strict-greater
    // takeover in insertion order (= max nb, earliest first_i on ties);
    // confidence 1.0 iff n >= minPoints(3) and the winner's count reaches
    // ceil(50% of n). No fallback branches — the reference elects even
    // from a single point.
    "q79_cluster_best" -> (electionCte +
      """,
        |w79 AS (
        |  SELECT nbr.user_id, nbr.lat, nbr.lng, nbr.nb,
        |    row_number() OVER (PARTITION BY nbr.user_id
        |      ORDER BY nbr.nb DESC, l.first_i ASC) AS rk
        |  FROM nbr JOIN locs l ON l.user_id = nbr.user_id
        |    AND l.lat = nbr.lat AND l.lng = nbr.lng)
        |SELECT un.user_id,
        |  CAST(un.n AS INT) AS n_points,
        |  w.lat AS cb_lat,
        |  w.lng AS cb_lng,
        |  CASE WHEN un.n >= 3 AND w.nb >= CAST(ceil(0.5 * un.n) AS BIGINT)
        |       THEN 1.0 ELSE 0.0 END AS confidence
        |FROM un
        |JOIN (SELECT user_id, lat, lng, nb FROM w79 WHERE rk = 1) w
        |  ON w.user_id = un.user_id
        |ORDER BY un.user_id""".stripMargin),

    // The A13 sequential walk replayed as a recursive CTE over the
    // time-ordered pings: each row carries the walking state (current
    // cluster start/count/sums, head and first coordinates) and the
    // closed-cluster emission of a 'new' step; the terminal row closes the
    // open cluster. Decisions mirror dbscanClustersWith exactly — join if
    // d(p, head) ≤ eps, else new cluster (closing the old one) if
    // d(p, first) > eps, else the silent drop. Kept clusters (cnt ≥ 3)
    // then feed bestClusterWith (distance branch gated d ≤ 100 with
    // last-cluster-wins non-strict ties = close_ord DESC; time branch on
    // integer |avgTs−delTs|), the chosen cluster's points (reverse-add
    // order = pos) feed the clusterBest election (q79's shape per
    // delivery), and low-confidence deliveries run the q78-style trim
    // recursion (threshold 25 — the only threshold A12's lastOption can
    // surface) over the same reverse-add list. n_clusters and
    // via_election pin which branch produced every row.
    "q81_refine_walk" ->
      (s"""WITH RECURSIVE vr AS (
          |  SELECT user_id, epoch_ms(ts) AS ts_ms, value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn
          |  FROM events WHERE event_type = 'view'),
          |v AS (
          |  SELECT user_id, ts_ms,
          |    (user_id % 90) - 45 + (CASE CAST((rn - 1) % 13 AS INT)
          |      WHEN 0 THEN 0.0 WHEN 1 THEN 0.952 WHEN 2 THEN 1.904 WHEN 3 THEN 0.4
          |      WHEN 4 THEN 13.0 WHEN 5 THEN 13.952 WHEN 6 THEN 14.904 WHEN 7 THEN 0.68
          |      WHEN 8 THEN 27.0 WHEN 9 THEN 28.308 WHEN 10 THEN 29.624 WHEN 11 THEN 30.948
          |      ELSE 32.28 END)::DOUBLE / 1000.0 AS lat,
          |    10.0::DOUBLE AS lng,
          |    value % 120.0 AS acc
          |  FROM vr),
          |ord AS (
          |  SELECT *,
          |    row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, lat, lng, acc) AS k,
          |    count(*) OVER (PARTITION BY user_id) AS nk
          |  FROM v),
          |walk AS (
          |  SELECT user_id, k, nk, 'new' AS dec, k AS cstart,
          |    1::BIGINT AS cnt, lat AS slat, lng AS slng, ts_ms AS sts,
          |    lat AS hlat, lng AS hlng, lat AS flat, lng AS flng,
          |    NULL::BIGINT AS ccl_start, NULL::BIGINT AS ccl_cnt,
          |    NULL::DOUBLE AS ccl_slat, NULL::DOUBLE AS ccl_slng, NULL::BIGINT AS ccl_sts
          |  FROM ord WHERE k = 1
          |  UNION ALL
          |  SELECT user_id, k2 AS k, nk,
          |    CASE WHEN dh <= 150.0 THEN 'add' WHEN df > 150.0 THEN 'new' ELSE 'drop' END AS dec,
          |    CASE WHEN dh <= 150.0 THEN cstart WHEN df > 150.0 THEN k2 ELSE cstart END AS cstart,
          |    CASE WHEN dh <= 150.0 THEN cnt + 1 WHEN df > 150.0 THEN 1 ELSE cnt END AS cnt,
          |    CASE WHEN dh <= 150.0 THEN slat + nlat WHEN df > 150.0 THEN nlat ELSE slat END AS slat,
          |    CASE WHEN dh <= 150.0 THEN slng + nlng WHEN df > 150.0 THEN nlng ELSE slng END AS slng,
          |    CASE WHEN dh <= 150.0 THEN sts + nts WHEN df > 150.0 THEN nts ELSE sts END AS sts,
          |    CASE WHEN dh <= 150.0 OR df > 150.0 THEN nlat ELSE hlat END AS hlat,
          |    CASE WHEN dh <= 150.0 OR df > 150.0 THEN nlng ELSE hlng END AS hlng,
          |    CASE WHEN df > 150.0 AND dh > 150.0 THEN nlat ELSE flat END AS flat,
          |    CASE WHEN df > 150.0 AND dh > 150.0 THEN nlng ELSE flng END AS flng,
          |    CASE WHEN dh > 150.0 AND df > 150.0 THEN cstart ELSE NULL END AS ccl_start,
          |    CASE WHEN dh > 150.0 AND df > 150.0 THEN cnt ELSE NULL END AS ccl_cnt,
          |    CASE WHEN dh > 150.0 AND df > 150.0 THEN slat ELSE NULL END AS ccl_slat,
          |    CASE WHEN dh > 150.0 AND df > 150.0 THEN slng ELSE NULL END AS ccl_slng,
          |    CASE WHEN dh > 150.0 AND df > 150.0 THEN sts ELSE NULL END AS ccl_sts
          |  FROM (
          |    SELECT w.user_id, w.nk, n.k AS k2, n.lat AS nlat, n.lng AS nlng,
          |      n.ts_ms AS nts, w.cstart, w.cnt, w.slat, w.slng, w.sts,
          |      w.hlat, w.hlng, w.flat, w.flng,
          |      ${havM("n.lat", "n.lng", "w.hlat", "w.hlng")} AS dh,
          |      ${havM("n.lat", "n.lng", "w.flat", "w.flng")} AS df
          |    FROM walk w JOIN ord n ON n.user_id = w.user_id AND n.k = w.k + 1
          |    WHERE w.k < w.nk) s),
          |closed AS (
          |  SELECT user_id, ccl_start AS cstart, ccl_cnt AS cnt, ccl_slat AS slat,
          |    ccl_slng AS slng, ccl_sts AS sts, k AS close_ord
          |  FROM walk WHERE ccl_start IS NOT NULL
          |  UNION ALL
          |  SELECT user_id, cstart, cnt, slat, slng, sts, nk + 1 AS close_ord
          |  FROM walk WHERE k = nk),
          |kept AS (
          |  SELECT user_id, cstart, cnt, close_ord,
          |    slat / cnt AS clat, slng / cnt AS clng, sts // cnt AS avgts
          |  FROM closed WHERE cnt >= 3),
          |nclus AS (SELECT user_id, count(*) AS n_clusters FROM kept GROUP BY 1),
          |members AS (SELECT user_id, cstart, k FROM walk WHERE dec <> 'drop'),
          |mpts AS (
          |  SELECT m.user_id, m.cstart, o.lat, o.lng, o.acc,
          |    row_number() OVER (PARTITION BY m.user_id, m.cstart ORDER BY m.k DESC) AS pos
          |  FROM members m
          |  JOIN ord o ON o.user_id = m.user_id AND o.k = m.k
          |  JOIN kept kc ON kc.user_id = m.user_id AND kc.cstart = m.cstart),
          |dr AS (
          |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prn
          |  FROM events WHERE event_type = 'purchase'),
          |del AS (
          |  SELECT user_id, event_id AS del_id, ts_ms AS del_ts,
          |    (user_id % 90) - 45 + (CASE CAST((prn - 1) % 4 AS INT)
          |      WHEN 0 THEN 0.2 WHEN 1 THEN 7.0 WHEN 2 THEN 13.5
          |      ELSE 29.0 END)::DOUBLE / 1000.0 AS del_lat,
          |    10.0::DOUBLE AS del_lng, value % 120.0 AS del_acc
          |  FROM dr),
          |npings AS (SELECT user_id, count(*) AS n_pings FROM v GROUP BY 1),
          |chosen AS (
          |  SELECT * FROM (
          |    SELECT d.del_id, d.user_id, kc.cstart, kc.cnt,
          |      row_number() OVER (PARTITION BY d.del_id ORDER BY
          |        CASE WHEN d.del_acc <= 100.0
          |             THEN ${havM("kc.clat", "kc.clng", "d.del_lat", "d.del_lng")}
          |             ELSE CAST(abs(kc.avgts - d.del_ts) AS DOUBLE) END ASC,
          |        kc.close_ord DESC) AS rk
          |    FROM del d JOIN kept kc ON kc.user_id = d.user_id
          |    WHERE d.del_acc > 100.0
          |       OR ${havM("kc.clat", "kc.clng", "d.del_lat", "d.del_lng")} <= 100.0) t
          |  WHERE rk = 1),
          |cpts AS (
          |  SELECT c.del_id, c.cnt AS n, p.lat, p.lng, p.acc, p.pos
          |  FROM chosen c JOIN mpts p ON p.user_id = c.user_id AND p.cstart = c.cstart),
          |cp AS (
          |  SELECT a.del_id, a.lat AS alat, a.lng AS alng,
          |    ${havM("a.lat", "a.lng", "b.lat", "b.lng")} AS d
          |  FROM cpts a JOIN cpts b ON a.del_id = b.del_id
          |    AND NOT (a.lat = b.lat AND a.lng = b.lng)),
          |clocs AS (SELECT del_id, lat, lng, min(pos) AS first_pos FROM cpts GROUP BY 1, 2, 3),
          |cnbr AS (
          |  SELECT l.del_id, l.lat, l.lng, l.first_pos,
          |    (SELECT count(*) FROM cp
          |     WHERE cp.del_id = l.del_id AND cp.alat = l.lat AND cp.alng = l.lng
          |       AND cp.d <= 200.0) AS nb
          |  FROM clocs l),
          |welect AS (
          |  SELECT * FROM (
          |    SELECT del_id, lat, lng, nb,
          |      row_number() OVER (PARTITION BY del_id ORDER BY nb DESC, first_pos ASC) AS rk
          |    FROM cnbr) t WHERE rk = 1),
          |echeck AS (
          |  SELECT w.del_id, w.lat, w.lng,
          |    (c.n >= 3 AND w.nb >= CAST(ceil(0.5 * c.n) AS BIGINT)) AS conf
          |  FROM welect w JOIN (SELECT DISTINCT del_id, n FROM cpts) c ON c.del_id = w.del_id),
          |tstart AS (
          |  SELECT cp2.del_id,
          |    list(struct_pack(lat := cp2.lat, lng := cp2.lng) ORDER BY cp2.pos)
          |      FILTER (WHERE cp2.acc <= 100.0) AS pts_q,
          |    list(struct_pack(lat := cp2.lat, lng := cp2.lng) ORDER BY cp2.pos) AS pts_all
          |  FROM cpts cp2 JOIN echeck e ON e.del_id = cp2.del_id AND NOT e.conf
          |  GROUP BY cp2.del_id),
          |trim_loop AS (
          |  SELECT del_id, pts_q AS pts, 0 AS iter, false AS done,
          |    CAST(NULL AS DOUBLE) AS c_lat, CAST(NULL AS DOUBLE) AS c_lng
          |  FROM tstart WHERE len(pts_q) > 3
          |  UNION ALL
          |  SELECT del_id,
          |    CASE WHEN avg_d > 25.0
          |      THEN list_transform(
          |        list_sort(ds)[1:(n - CAST(greatest(floor(n * 0.1), 1) AS INT))],
          |        s -> pts[s.k])
          |      ELSE pts END,
          |    iter + 1,
          |    avg_d <= 25.0,
          |    clat, clng
          |  FROM (
          |    SELECT del_id, pts, iter, n, clat, clng,
          |      list_transform(generate_series(1, n), k -> struct_pack(
          |        d := (2 * 6371.0 * asin(sqrt(
          |          pow(sin(radians(pts[k].lat - clat) / 2), 2) +
          |          cos(radians(clat)) * cos(radians(pts[k].lat)) *
          |          pow(sin(radians(pts[k].lng - clng) / 2), 2)))) * 1000.0,
          |        k := k)) AS ds
          |    FROM (
          |      SELECT del_id, pts, iter, len(pts) AS n,
          |        list_aggregate(list_transform(pts, x -> x.lat), 'sum') / len(pts) AS clat,
          |        list_aggregate(list_transform(pts, x -> x.lng), 'sum') / len(pts) AS clng
          |      FROM trim_loop WHERE NOT done AND len(pts) > 3)
          |  ) step,
          |  LATERAL (SELECT list_aggregate(list_transform(list_sort(ds), s -> s.d), 'sum') / n AS avg_d) a),
          |tterm AS (
          |  SELECT del_id, c_lat, c_lng,
          |    row_number() OVER (PARTITION BY del_id ORDER BY iter DESC) AS rk
          |  FROM trim_loop),
          |tfb AS (
          |  SELECT del_id,
          |    CASE WHEN len(pts_q) > 0
          |      THEN list_aggregate(list_transform(pts_q, x -> x.lat), 'sum') / len(pts_q)
          |      ELSE list_aggregate(list_transform(pts_all, x -> x.lat), 'sum') / len(pts_all) END AS f_lat,
          |    CASE WHEN len(pts_q) > 0
          |      THEN list_aggregate(list_transform(pts_q, x -> x.lng), 'sum') / len(pts_q)
          |      ELSE list_aggregate(list_transform(pts_all, x -> x.lng), 'sum') / len(pts_all) END AS f_lng
          |  FROM tstart),
          |trimres AS (
          |  SELECT f.del_id, COALESCE(t.c_lat, f.f_lat) AS t_lat, COALESCE(t.c_lng, f.f_lng) AS t_lng
          |  FROM tfb f LEFT JOIN (SELECT del_id, c_lat, c_lng FROM tterm WHERE rk = 1) t
          |    ON t.del_id = f.del_id)
          |SELECT d.del_id,
          |  round(CASE WHEN e.del_id IS NULL THEN d.del_lat
          |             WHEN e.conf THEN e.lat ELSE tr.t_lat END, 6) AS refined_lat,
          |  round(CASE WHEN e.del_id IS NULL THEN d.del_lng
          |             WHEN e.conf THEN e.lng ELSE tr.t_lng END, 6) AS refined_lng,
          |  (e.del_id IS NOT NULL) AS was_refined,
          |  CAST(COALESCE(nc.n_clusters, 0) AS INT) AS n_clusters,
          |  COALESCE(e.conf, FALSE) AS via_election,
          |  CAST(np.n_pings AS INT) AS n_pings
          |FROM del d
          |JOIN npings np ON np.user_id = d.user_id
          |LEFT JOIN nclus nc ON nc.user_id = d.user_id
          |LEFT JOIN echeck e ON e.del_id = d.del_id
          |LEFT JOIN trimres tr ON tr.del_id = d.del_id
          |ORDER BY d.del_id""".stripMargin),

    // A12's trim loop replayed as a recursive CTE carrying the per-user
    // point list: each step computes the centroid (list-order sums, same
    // order as the Scala fold), per-point haversine meters (op-for-op
    // haversineMScala), sorts by struct(d, position) (= Scala's stable
    // sortBy(_._2)), and drops greatest(floor(n*0.1),1) farthest while
    // mean distance > 25 and n > 3. The terminal row's centroid (computed
    // BEFORE the final drop, as in the Scala loop) is the answer; users
    // whose acc<=100 qualifying list never exceeds 3 points fall back to
    // the plain mean (of qualifying points, else of all points).
    "q78_trimmed_centroid" ->
      """WITH RECURSIVE g AS (
        |  SELECT user_id,
        |    (user_id % 120) - 60 + floor(value % 7) / (1000.0 * (1 + user_id % 4)) + (event_id % 5) / 100000.0 AS lat,
        |    (user_id % 340) - 170 + (event_id % 11) / (1000.0 * (1 + user_id % 4)) + floor(value % 13) / 100000.0 AS lng,
        |    floor(value % 5) * 30.0 + 10.0 AS acc,
        |    epoch_ms(ts) AS ts_ms
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |f AS (
        |  SELECT user_id, lat, lng, acc, min(ts_ms) AS fts
        |  FROM g GROUP BY 1, 2, 3, 4),
        |r AS (
        |  SELECT user_id, lat, lng, acc, fts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY fts DESC, lat DESC, lng DESC, acc DESC) AS rnd
        |  FROM f),
        |idx AS (
        |  SELECT user_id, lat, lng, acc,
        |    row_number() OVER (PARTITION BY user_id ORDER BY fts, lat, lng, acc) AS i
        |  FROM r WHERE rnd <= 20),
        |start AS (
        |  SELECT user_id,
        |    list(struct_pack(lat := lat, lng := lng) ORDER BY i) FILTER (WHERE acc <= 100) AS pts_q,
        |    list(struct_pack(lat := lat, lng := lng) ORDER BY i) AS pts_all
        |  FROM idx GROUP BY user_id),
        |trim_loop AS (
        |  SELECT user_id, pts_q AS pts, 0 AS iter, false AS done,
        |    CAST(NULL AS DOUBLE) AS c_lat, CAST(NULL AS DOUBLE) AS c_lng
        |  FROM start WHERE len(pts_q) > 3
        |  UNION ALL
        |  SELECT user_id,
        |    CASE WHEN avg_d > 25.0
        |      THEN list_transform(
        |        list_sort(ds)[1:(n - CAST(greatest(floor(n * 0.1), 1) AS INT))],
        |        s -> pts[s.k])
        |      ELSE pts END,
        |    iter + 1,
        |    avg_d <= 25.0,
        |    clat, clng
        |  FROM (
        |    SELECT user_id, pts, iter, n, clat, clng,
        |      list_transform(generate_series(1, n), k -> struct_pack(
        |        d := (2 * 6371.0 * asin(sqrt(
        |          pow(sin(radians(pts[k].lat - clat) / 2), 2) +
        |          cos(radians(clat)) * cos(radians(pts[k].lat)) *
        |          pow(sin(radians(pts[k].lng - clng) / 2), 2)))) * 1000.0,
        |        k := k)) AS ds
        |    FROM (
        |      SELECT user_id, pts, iter, len(pts) AS n,
        |        list_aggregate(list_transform(pts, x -> x.lat), 'sum') / len(pts) AS clat,
        |        list_aggregate(list_transform(pts, x -> x.lng), 'sum') / len(pts) AS clng
        |      FROM trim_loop WHERE NOT done AND len(pts) > 3)
        |  ) step,
        |  LATERAL (SELECT list_aggregate(list_transform(list_sort(ds), s -> s.d), 'sum') / n AS avg_d) a
        |),
        |term AS (
        |  SELECT user_id, c_lat, c_lng,
        |    row_number() OVER (PARTITION BY user_id ORDER BY iter DESC) AS rk
        |  FROM trim_loop),
        |fb AS (
        |  SELECT user_id,
        |    CASE WHEN len(pts_q) > 0
        |      THEN list_aggregate(list_transform(pts_q, x -> x.lat), 'sum') / len(pts_q)
        |      ELSE list_aggregate(list_transform(pts_all, x -> x.lat), 'sum') / len(pts_all) END AS f_lat,
        |    CASE WHEN len(pts_q) > 0
        |      THEN list_aggregate(list_transform(pts_q, x -> x.lng), 'sum') / len(pts_q)
        |      ELSE list_aggregate(list_transform(pts_all, x -> x.lng), 'sum') / len(pts_all) END AS f_lng
        |  FROM start)
        |SELECT s.user_id,
        |  CAST(len(s.pts_all) AS INT) AS n_points,
        |  COALESCE(t.c_lat, fb.f_lat) AS c_lat,
        |  COALESCE(t.c_lng, fb.f_lng) AS c_lng
        |FROM start s
        |LEFT JOIN (SELECT user_id, c_lat, c_lng FROM term WHERE rk = 1) t ON t.user_id = s.user_id
        |JOIN fb ON fb.user_id = s.user_id
        |ORDER BY s.user_id""".stripMargin,

    // interval-halving with strict `>` exactly as geohashEncodeScala;
    // endpoints stay dyadic (k-th midpoints are j*360/2^k) so (lo+hi)/2
    // is computed without rounding and the bits match the Scala loop
    // bit-for-bit — verified identical on the full sf0.01 cell table
    "q23_geohash_cells" ->
      """WITH RECURSIVE pts AS (
        |  SELECT event_id,
        |    (user_id % 120) - 60 + value / 1000.0 AS lat,
        |    (event_id % 340) - 170 + value / 1000.0 AS lng,
        |    value
        |  FROM events),
        |steps AS (
        |  SELECT event_id, lat, lng, value,
        |    CAST(-90.0 AS DOUBLE) AS minlat, CAST(90.0 AS DOUBLE) AS maxlat,
        |    CAST(-180.0 AS DOUBLE) AS minlng, CAST(180.0 AS DOUBLE) AS maxlng,
        |    0 AS i, '' AS bits
        |  FROM pts
        |  UNION ALL
        |  SELECT event_id, lat, lng, value,
        |    CASE WHEN i % 2 = 1 AND lat > (minlat+maxlat)/2 THEN (minlat+maxlat)/2 ELSE minlat END,
        |    CASE WHEN i % 2 = 1 AND NOT (lat > (minlat+maxlat)/2) THEN (minlat+maxlat)/2 ELSE maxlat END,
        |    CASE WHEN i % 2 = 0 AND lng > (minlng+maxlng)/2 THEN (minlng+maxlng)/2 ELSE minlng END,
        |    CASE WHEN i % 2 = 0 AND NOT (lng > (minlng+maxlng)/2) THEN (minlng+maxlng)/2 ELSE maxlng END,
        |    i + 1,
        |    bits || CASE WHEN i % 2 = 0
        |      THEN (CASE WHEN lng > (minlng+maxlng)/2 THEN '1' ELSE '0' END)
        |      ELSE (CASE WHEN lat > (minlat+maxlat)/2 THEN '1' ELSE '0' END) END
        |  FROM steps WHERE i < 25),
        |fin AS (SELECT event_id, value, bits FROM steps WHERE i = 25),
        |ch AS (
        |  SELECT event_id, value, g,
        |    16*CAST(substring(bits, 5*g+1, 1) AS INT) + 8*CAST(substring(bits, 5*g+2, 1) AS INT)
        |    + 4*CAST(substring(bits, 5*g+3, 1) AS INT) + 2*CAST(substring(bits, 5*g+4, 1) AS INT)
        |    + CAST(substring(bits, 5*g+5, 1) AS INT) AS v
        |  FROM fin, LATERAL (SELECT unnest(generate_series(0, 4)) AS g) t),
        |cells AS (
        |  SELECT event_id, value,
        |    string_agg(substring('0123456789bcdefghjkmnpqrstuvwxyz', v+1, 1), '' ORDER BY g) AS cell
        |  FROM ch GROUP BY 1, 2)
        |SELECT cell, count(*) AS n,
        |  round(CAST(sum(value) AS DOUBLE), 2) / count(*) AS avg_value
        |FROM cells GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin
  )
}
