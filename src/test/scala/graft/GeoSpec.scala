package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.spatial.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def bruteWithin(pts: Seq[(Long, Double, Double)], eps: Double) = {
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val sdlat = math.sin(math.toRadians(b._1 - a._1) / 2)
      val sdlon = math.sin(math.toRadians(b._2 - a._2) / 2)
      val h = sdlat * sdlat +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) * sdlon * sdlon
      2.0 * 6371.0088 * math.asin(math.sqrt(h))
    }
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d = BigDecimal(hav((a._2, a._3), (b._2, b._3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if d <= eps
    } yield (a._1, b._1, d)).toSet
  }

  private def df(pts: Seq[(Long, Double, Double)]): DataFrame =
    pts.toDF("id", "lat", "lon")

  test("gridNeighborPairs equals brute force on seam-straddling points") {
    // The regression that shipped (and the oracle caught): a cap large
    // enough that the short arc crosses the ±180 seam. Points sit at the
    // band's lon extremes and high latitude, where the seam gap is
    // narrowest (~1174 km at lat 58 for the 20° margin).
    val pts = Seq(
      (1L, 57.0, -169.9), (2L, 57.0, 169.9),   // ~1208 km across the seam
      (3L, 56.5, -150.0), (4L, -57.0, 169.9),  // far side / other hemisphere
      (5L, 0.0, -169.9), (6L, 0.0, 169.9),     // equator seam pair ~2247 km
      (7L, 10.0, 10.0), (8L, 10.5, 10.5))
    for (eps <- Seq(1300.0, 2500.0, 3000.0)) {
      val got = Geo.gridNeighborPairs(df(pts), "id", eps)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == bruteWithin(pts, eps), s"eps=$eps")
    }
  }

  test("gridJoinWithin equals brute force bipartite, including the wrap") {
    val left = Seq((1L, 57.5, -169.5), (2L, -30.0, 0.0), (3L, 40.0, 100.0))
    val right = Seq((10L, 57.0, 169.9), (11L, -31.0, 1.0), (12L, 41.0, 101.0),
      (13L, 57.9, -150.0))
    val cap = 3000.0
    val got = Geo.gridJoinWithin(df(left), df(right), "id", "id", cap)
      .as[(Long, Long, Double)].collect().toSet
    val brute = (for {
      a <- left; b <- right
      d = bruteWithin(Seq(a, (b._1 + 1000L, b._2, b._3)), 1e9)
        .find(_._2 == b._1 + 1000L).get._3
      if d <= cap
    } yield (a._1, b._1, d)).toSet
    assert(got == brute)
  }

  test("gridSpec refuses radii the band or the 3-cell ring cannot serve") {
    // 6000 km: sin(d/2R)/cos58 ≈ 0.854 → Δλ ≈ 117° → nLon = 3 still ok;
    // 9000 km pushes sinHalf past 1 inside the band.
    assert(Geo.gridSpec(3000.0)._2 >= 3)
    intercept[IllegalArgumentException](Geo.gridSpec(9000.0))
  }

  test("geohash cell matches published geohashes and the SQL-function surface") {
    import graft.spatial.Geohash
    // Known geohashes: geohash.org test vectors.
    assert(Geohash.base32(Geohash.cell(57.64911, 10.40744, 5), 5) == "u4pru")
    assert(Geohash.base32(Geohash.cell(0.0, 0.0, 5), 5) == "s0000")
    assert(Geohash.base32(Geohash.cell(-25.382708, -49.265506, 6), 6) == "6gkzwg")
    // Native column path == scalar reference, and the registered SQL
    // function resolves to the same kernel.
    graft.plans.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_geohash(57.64911d, 10.40744d, 5) AS c").head().getLong(0)
    assert(got == Geohash.cell(57.64911, 10.40744, 5))
    // base32Col (the SQL-expressible rendering) == the scalar rendering.
    import spark.implicits._
    val rendered = Seq(Geohash.cell(57.64911, 10.40744, 5)).toDF("cell")
      .select(Geohash.base32Col("cell", 5)).as[String].head()
    assert(rendered == "u4pru")
    // Closed boundary: lat 90 / lon 180 clamp into the LAST cell (the
    // standard edge convention) instead of overflowing 2^bits and
    // shifting a stray bit into the wrong interleave slot.
    assert(Geohash.cell(90.0, 180.0, 5) == (1L << 25) - 1)
    assert(Geohash.base32(Geohash.cell(90.0, 180.0, 5), 5) == "zzzzz")
    // Just inside the boundary stays in the same last cell.
    assert(Geohash.cell(89.9999999, 179.9999999, 5) ==
      Geohash.cell(90.0, 180.0, 5))
  }

  test("haversine column matches the scalar reference formula") {
    val got = Seq((51.5074, -0.1278, 48.8566, 2.3522))
      .toDF("la", "lo", "lb", "ln")
      .select(round(Geo.haversineKm(col("la"), col("lo"), col("lb"), col("ln")), 3))
      .as[Double].head()
    assert(math.abs(got - 343.556) < 0.01) // London–Paris ≈ 343.5 km
  }

  test("maxPerCell cap drops over-dense cells entirely and reports them") {
    // The r8 sf10 probe measured the fixed-radius pair stream quadratic
    // in density (q254 56×/decade, q256 OOM): this is the code-level
    // knob. One hot cell (6 co-located points) + scattered points; cap 5
    // must (a) drop ALL hot-cell points — skip, never sample — (b) leave
    // the survivors' pairs EXACTLY equal to brute force over the
    // survivors, and (c) surface the dropped cell via overDenseCells.
    val hot = (1L to 6L).map(i => (i, 10.0 + i * 1e-4, 10.0))
    val cold = Seq((20L, 30.0, 30.0), (21L, 30.2, 30.2), (22L, -40.0, 100.0))
    val pts = hot ++ cold
    val eps = 500.0
    val capped = Geo.gridNeighborPairs(df(pts), "id", eps, maxPerCell = Some(5))
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == bruteWithin(cold, eps),
      "survivor pairs must equal brute force over the non-dropped points")
    assert(capped.flatMap(p => Seq(p._1, p._2)).forall(_ >= 20L),
      "no hot-cell point may leak into the pair stream")
    val dropped = Geo.overDenseCells(df(pts), "id", eps, maxPerCell = 5)
      .select(col("n_points")).as[Long].collect().toSeq
    assert(dropped == Seq(6L), "the hot cell must be reported with its mass")
    // Default (no cap) is unchanged: full brute-force parity.
    val uncapped = Geo.gridNeighborPairs(df(pts), "id", eps)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped == bruteWithin(pts, eps))
  }

  test("scaledEps: exact at nRef, area tracks 1/density, clamp stays feasible") {
    // The rows-derived default policy behind the q356-q358 primary faces.
    // At the reference count the radius is EXACTLY eps0 (sqrt(1.0) is an
    // IEEE identity) — this equality is what lets the scaled face share
    // the fixed face's semantics at the gate sf.
    assert(Geo.scaledEps(500.0, 1500L, 1500L) == 500.0)
    assert(Geo.scaledEps(400.0, 1500L, 1500L) == 400.0)
    // Perfect-square density growth halves the radius exactly: eps² — and
    // with it the grid cell AREA and the expected per-cell occupancy —
    // is ∝ 1/n. 4× the points ⇒ half the radius ⇒ the expected points
    // per eps-disc (the per-point pair work) is unchanged.
    assert(Geo.scaledEps(500.0, 1500L, 6000L) == 250.0)
    assert(Geo.scaledEps(500.0, 1500L, 150000L) == 50.0)
    // Tiny corpora clamp to 6000 km, which gridSpec can still serve
    // (nLon = 3, inside the 6074 km feasibility bound) — the scaled face
    // can never construct an infeasible grid.
    assert(Geo.scaledEps(500.0, 1500L, 2L) == 6000.0)
    assert(Geo.gridSpec(6000.0)._2 >= 3)
    // The sf0.001 gate point: 150 customers ⇒ eps = 500·√10, feasible.
    val eps001 = Geo.scaledEps(500.0, 1500L, 150L)
    assert(math.abs(eps001 - 500.0 * math.sqrt(10.0)) == 0.0)
    assert(Geo.gridSpec(eps001)._2 >= 3)
    intercept[IllegalArgumentException](Geo.scaledEps(500.0, 1500L, 0L))
  }
}
