package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Elections
import graft.operators.Elections.Pt

class ElectionsSpec extends AnyFunSuite {

  // a tight cluster near Bangalore + two outliers; non-zero lats (vincenty
  // zero-guard would poison distances otherwise)
  private val cluster = Seq(
    Pt(12.9716, 77.5946, 10, 1000),
    Pt(12.9717, 77.5947, 12, 2000),
    Pt(12.9718, 77.5945, 15, 3000),
    Pt(12.9715, 77.5948, 20, 4000))
  private val outliers = Seq(
    Pt(13.2000, 77.9000, 30, 5000),
    Pt(12.5000, 77.1000, 40, 6000))

  test("A10 bestLatLng: <4 points returns last point") {
    val pts = cluster.take(3)
    assert(Elections.bestLatLng(pts) == (12.9718, 77.5945))
  }

  test("A10 bestLatLng: >500 points returns last point") {
    val many = (1 to 501).map(i => Pt(10 + i * 0.001, 70, 5, i.toLong))
    assert(Elections.bestLatLng(many) == (many.last.lat, many.last.lng))
  }

  test("A10 bestLatLng: picks densest point, first max wins") {
    val pts = cluster ++ outliers
    val (lat, lng) = Elections.bestLatLng(pts)
    // all 4 cluster points have 4 neighbors (within 300m incl. self);
    // first of them wins the tie
    assert((lat, lng) == (12.9716, 77.5946))
  }

  test("electBoth matches bestLatLng + clusterScore exactly (shared matrix)") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { caseId =>
      val n = rnd.nextInt(13) // 0..12 points, covers all early-exit paths
      val baseLat = 5 + rnd.nextDouble() * 50
      val baseLng = -100 + rnd.nextDouble() * 200
      val pts = (0 until n).map { i =>
        // mix of tight-cluster and scattered points so radius/threshold
        // boundaries are exercised
        val spread = if (rnd.nextBoolean()) 0.0005 else 0.5
        Pt(baseLat + (rnd.nextDouble() - 0.5) * spread,
          baseLng + (rnd.nextDouble() - 0.5) * spread,
          rnd.nextDouble() * 100, i.toLong)
      }
      val expected = (Elections.bestLatLng(pts), Elections.clusterScore(pts))
      assert(Elections.electBoth(pts) == expected, s"case $caseId n=$n")
    }
    // plus the canonical fixtures
    Seq(cluster, cluster ++ outliers, cluster.take(3), Nil).foreach { pts =>
      assert(Elections.electBoth(pts) ==
        (Elections.bestLatLng(pts), Elections.clusterScore(pts)))
    }
  }

  test("A11 clusterScore: <3 points → last point, confidence 0") {
    val pts = cluster.take(2)
    val (lat, lng, conf) = Elections.clusterScore(pts)
    assert((lat, lng) == (12.9717, 77.5947) && conf == 0.0)
  }

  test("A11 clusterScore: majority cluster → confidence 1") {
    val (_, _, conf) = Elections.clusterScore(cluster ++ outliers.take(1))
    assert(conf == 1.0)
  }

  test("A11 clusterScore: no majority → confidence 0") {
    val spread = Seq(
      Pt(12.0, 77.0, 10, 1), Pt(13.0, 78.0, 10, 2),
      Pt(14.0, 79.0, 10, 3), Pt(15.0, 80.0, 10, 4))
    val (_, _, conf) = Elections.clusterScore(spread)
    assert(conf == 0.0)
  }

  test("dedupAndCap keeps first occurrence of (lat,lng,acc), then last 100") {
    val dup = Pt(1.0, 2.0, 3.0, 100)
    val pts = Seq(dup, Pt(1.0, 2.0, 3.0, 999), Pt(4.0, 5.0, 6.0, 200))
    val out = Elections.dedupAndCap(pts)
    assert(out == Seq(dup, Pt(4.0, 5.0, 6.0, 200)))
    // cap: 150 distinct → newest 100 kept (takeRight of time-sorted input)
    val many = (1 to 150).map(i => Pt(i * 0.01, 1, 1, i.toLong))
    val capped = Elections.dedupAndCap(many)
    assert(capped.size == 100 && capped.head.ts == 51L && capped.last.ts == 150L)
  }

  test("A13 dbscanClusters splits on distance, drops small clusters") {
    // two well-separated clusters in time order + one lone point
    val c1 = (1 to 4).map(i => Pt(12.9716 + i * 0.0001, 77.5946, 10, i.toLong))
    val lone = Pt(20.0, 70.0, 10, 10L)
    val c2 = (20 to 24).map(i => Pt(13.5 + (i - 20) * 0.0001, 78.2, 10, i.toLong))
    val clusters = Elections.dbscanClusters(c1 ++ Seq(lone) ++ c2, epsM = 500, minCount = 3)
    assert(clusters.size == 2)
    assert(clusters.head.points.size == 4 && clusters(1).points.size == 5)
    // centroid of first cluster ≈ mean of its lats
    assert(math.abs(clusters.head.lat - (12.9716 + 0.00025)) < 1e-9)
  }

  test("A13 middle-case ping (near tail, far from head) is dropped") {
    // reference DeliveryLocationRefinementService.scala:148-165: a ping
    // farther than eps from the newest point but within eps of the oldest
    // is silently skipped
    val pts = Seq(
      Pt(10.0000, 70.0, 5, 1),
      Pt(10.0040, 70.0, 5, 2), // ~440 m from head: joins (eps 500)
      Pt(10.0080, 70.0, 5, 3)) // 440 m from newest(10.004) joins... pick eps smaller
    val clusters = Elections.dbscanClusters(pts, epsM = 450, minCount = 2)
    assert(clusters.head.points.size == 3)
    val pts2 = Seq(
      Pt(10.0000, 70.0, 5, 1),
      Pt(10.0040, 70.0, 5, 2),  // joins via head
      Pt(10.0001, 70.0, 5, 3))  // 430m from newest (10.004) → joins; craft drop:
    val pts3 = Seq(
      Pt(10.0000, 70.0, 5, 1),
      Pt(10.0050, 70.0, 5, 2))  // 553m from head AND 553m from tail → new cluster
    val cl3 = Elections.dbscanClusters(pts3, epsM = 500, minCount = 1)
    assert(cl3.size == 2)
  }

  test("A12 trimmedCentroid converges to cluster center despite outlier") {
    val pts = cluster ++ Seq(Pt(12.99, 77.61, 50, 9000))
    val (lat, lng) = Elections.trimmedCentroid(pts)
    assert(math.abs(lat - 12.97165) < 0.001 && math.abs(lng - 77.59465) < 0.001)
  }

  test("electBothWith/trimmedCentroidWith(vincenty) == the vincenty originals") {
    val rnd = new scala.util.Random(7)
    val vinc = (a: Pt, b: Pt) =>
      graft.functions.GeoFunctions.vincentyM(a.lat, a.lng, b.lat, b.lng)
    val vinc4 = graft.functions.GeoFunctions.vincentyM _
    (0 until 100).foreach { caseId =>
      val n = rnd.nextInt(13)
      val pts = (0 until n).map { i =>
        Pt(5 + rnd.nextDouble() * 50, -100 + rnd.nextDouble() * 200,
          rnd.nextDouble() * 150, i.toLong)
      }
      assert(Elections.electBothWith(pts, vinc) == Elections.electBoth(pts),
        s"case $caseId n=$n")
      assert(Elections.clusterBestWith(pts, vinc) == Elections.clusterBest(pts),
        s"case $caseId n=$n")
      if (n > 0) // n=0 is NaN/NaN on both sides (0/0 fallback mean)
        assert(Elections.trimmedCentroidWith(pts, vinc4) ==
          Elections.trimmedCentroid(pts), s"case $caseId n=$n")
    }
  }

  test("refineDeliveryLocationWith(vincenty) == refineDeliveryLocation") {
    val rnd = new scala.util.Random(11)
    val vinc4 = graft.functions.GeoFunctions.vincentyM _
    (0 until 100).foreach { caseId =>
      val n = rnd.nextInt(15)
      // mix degree-scale scatter with tight sub-eps jitter so the walk
      // actually forms multi-point clusters in some cases
      val baseLat = 5 + rnd.nextDouble() * 40
      val baseLng = -50 + rnd.nextDouble() * 100
      val pings = (0 until n).map { i =>
        if (rnd.nextBoolean())
          Pt(baseLat + rnd.nextDouble() * 0.001, baseLng + rnd.nextDouble() * 0.001,
            rnd.nextDouble() * 150, i.toLong * 1000)
        else
          Pt(baseLat + rnd.nextDouble() * 5, baseLng + rnd.nextDouble() * 5,
            rnd.nextDouble() * 150, i.toLong * 1000)
      }
      val dLat = baseLat + rnd.nextDouble() * 0.001
      val dLng = baseLng + rnd.nextDouble() * 0.001
      val dAcc = rnd.nextDouble() * 150
      // vary the walk parameters too — q41 runs eps=200000/minCount=3,
      // q81 eps=150/minCount=3; the parity must hold across the range
      val eps = Seq(150, 2000, 200000)(rnd.nextInt(3))
      val mc = 2 + rnd.nextInt(3)
      val old = Elections.refineDeliveryLocation(dLat, dLng, 5000L, dAcc, pings,
        epsM = eps, minCount = mc)
      val r = Elections.refineDeliveryLocationWith(dLat, dLng, 5000L, dAcc, pings,
        vinc4, epsM = eps, minCount = mc)
      assert((r._1, r._2, r._3) == old, s"case $caseId n=$n eps=$eps mc=$mc")
      // consistency of the enriched fields with the public result
      assert(r._3 || (r._1 == dLat && r._2 == dLng), s"case $caseId unrefined echoes delivery")
      assert(!r._5 || r._3, s"case $caseId viaElection implies refined")
      assert(r._4 >= 0, s"case $caseId cluster count")
    }
  }

  test("A13 walk kernel swap: drop and discard cases match under haversine") {
    import graft.functions.GeoFunctions.haversineMScala
    // meridian chain at ~105.9 m steps (eps=150): p0,p1,p2 join; p3 at
    // 0.4e-3 deg is >eps from the head (1.904) but <=eps from the first
    // (0.0) -> the reference's silent drop; p4 far away -> closes c1,
    // opens a cluster that dies below minCount -> discarded.
    val pts = Seq(
      Pt(10.0, 10.0, 5, 1000), Pt(10.000952, 10.0, 5, 2000),
      Pt(10.001904, 10.0, 5, 3000), Pt(10.0004, 10.0, 5, 4000),
      Pt(10.013, 10.0, 5, 5000))
    val clusters = Elections.dbscanClustersWith(pts, haversineMScala,
      epsM = 150, minCount = 3)
    assert(clusters.length == 1, s"got $clusters")
    assert(clusters.head.points.length == 3, "p3 dropped, p4 discarded")
    assert(clusters.head.points.map(_.ts).toSet == Set(1000L, 2000L, 3000L))
    // points list is reverse-add order (head = most recently added)
    assert(clusters.head.points.map(_.ts) == Seq(3000L, 2000L, 1000L))
  }

  test("electBothWith actually applies the supplied kernel") {
    // asymmetric kernel: the ts=2000 point sees d=0 to every j (neighbor
    // count 4); every other point sees 1e9 everywhere (count 0, not even
    // self) — A10 must elect the ts=2000 point, which vincenty would not
    // (all four cluster points tie at 4 and the FIRST wins under vincenty).
    val fake = (a: Pt, b: Pt) => if (a.ts == 2000L) 0.0 else 1e9
    val ((blat, blng), _) = Elections.electBothWith(cluster, fake)
    assert((blat, blng) == (12.9717, 77.5947))
  }

  test("A13 refineDeliveryLocation picks ping cluster near delivery") {
    val pings = (1 to 6).map(i => Pt(12.9716 + i * 0.00005, 77.5946, 10, 1000L + i))
    val (lat, lng, refined) = Elections.refineDeliveryLocation(
      12.9718, 77.5947, 1003L, 50.0, pings, epsM = 300, minCount = 3)
    assert(refined)
    assert(math.abs(lat - 12.9718) < 0.001 && math.abs(lng - 77.5946) < 0.001)
  }
}
