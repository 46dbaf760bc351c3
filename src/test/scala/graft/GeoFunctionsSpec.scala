package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoFunctions._

class GeoFunctionsSpec extends AnyFunSuite {

  test("geohash encode matches public test vectors") {
    // canonical example from the public geohash spec
    assert(geohashEncodeScala(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(geohashEncodeScala(42.6, -5.6, 5) == "ezs42")
    // reference precision-7 usage (SmartAddressBuildService.scala:210);
    // value cross-checked against the decode round-trip below
    assert(geohashEncodeScala(12.9716, 77.5946, 7) == "tdr1v9q")
    val (bla, blng) = geohashDecodeScala("tdr1v9q")
    assert(math.abs(bla - 12.9716) < 0.001 && math.abs(blng - 77.5946) < 0.001)
  }

  test("geohash decode returns cell center, round-trips encode") {
    val (lat, lng) = geohashDecodeScala("ezs42")
    assert(math.abs(lat - 42.605) < 0.03 && math.abs(lng - (-5.603)) < 0.03)
    for ((la, ln) <- Seq((0.5, 0.5), (-33.86, 151.21), (89.9, -179.9))) {
      val gh = geohashEncodeScala(la, ln, 9)
      val (dla, dln) = geohashDecodeScala(gh)
      assert(math.abs(dla - la) < 0.001 && math.abs(dln - ln) < 0.001)
    }
  }

  test("vincenty zero-latitude guard returns 1e7 (reference semantics)") {
    // BestLatLngCalculator.scala:16-23 treats lat==0 as invalid
    assert(vincentyM(0.0, 10.0, 20.0, 10.0) == 1.0e7)
    assert(vincentyM(20.0, 10.0, 0.0, 10.0) == 1.0e7)
  }

  test("vincenty matches known WGS84 geodesic distances") {
    // Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278): 343.9 km (WGS84)
    val pl = vincentyM(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(pl - 343923.0) < 200.0, s"got $pl")
    // one degree of latitude at the equator-adjacent band ≈ 110.6 km
    val d1 = vincentyM(1.0, 0.0, 2.0, 0.0)
    assert(math.abs(d1 - 110575.0) < 500.0, s"got $d1")
    assert(vincentyM(12.5, 77.5, 12.5, 77.5) == 0.0)
  }

  test("haversine matches mean-earth great circle") {
    // reference uses 6371 km radius (TripTrackingService.scala:69-75)
    val d = haversineKmScala(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(d - 343.56) < 1.0, s"got $d")
    assert(haversineKmScala(10, 10, 10, 10) == 0.0)
  }
}
