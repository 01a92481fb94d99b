package graft.olap

import graft.SparkSpec

/** The geo family against independent plain-Scala re-implementations:
  * the generated geohash must decode (via a from-scratch base32
  * de-interleaver) back to exactly the quantized cell of the point, and
  * the division-cleared integer ray casting must agree with a classic
  * floating-point crossing counter on every customer point. */
class GeoSpec extends SparkSpec {

  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Independent decoder: gh5 chars → 25-bit value → de-interleaved
    * (lonb 13 bits, latb 12 bits). */
  private def decode(gh5: String): (Long, Long) = {
    val v = gh5.map(c => B32.indexOf(c).toLong).reduce((a, b) => a * 32 + b)
    var lonb = 0L
    var latb = 0L
    for (i <- 0 until 25) {
      val bit = (v >> (24 - i)) & 1
      if (i % 2 == 0) lonb = lonb * 2 + bit else latb = latb * 2 + bit
    }
    (lonb, latb)
  }

  /** Classic double-precision even-odd crossing counter. */
  private def rayCast(x: Double, y: Double): Boolean = {
    val poly = OlapGeoQueries.Poly.map { case (px, py) => (px.toDouble, py.toDouble) }
    var inside = false
    for (((x1, y1), (x2, y2)) <- poly.zip(poly.tail :+ poly.head)) {
      if ((y1 > y) != (y2 > y) && x < x1 + (x2 - x1) * (y - y1) / (y2 - y1))
        inside = !inside
    }
    inside
  }

  test("geohash decodes to the point's quantized cell; ray cast agrees") {
    val rows = OlapGeoQueries.points(spark, SF).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (gh5, inPoly) = (r.getString(0), r.getBoolean(1))
      val (lat100, lon100) = (r.getLong(2), r.getLong(3))
      val (lonb, latb) = decode(gh5)
      assert(latb === (lat100 + 9000) * 4096 / 18000, s"latb of $gh5")
      assert(lonb === (lon100 + 18000) * 8192 / 36000, s"lonb of $gh5")
      assert(inPoly === rayCast(lon100.toDouble, lat100.toDouble),
        s"in_poly at ($lon100, $lat100)")
    }
    // both polygon branches are exercised
    assert(rows.exists(_.getBoolean(1)) && rows.exists(!_.getBoolean(1)))
  }

  test("great-circle distances match an independent haversine within 1 km") {
    val rows = OlapGeoQueries.qGeoDist(spark, SF).collect()
    assert(rows.length === 25)
    for (r <- rows) {
      val nk = r.getAs[Number]("nk").longValue
      val km = r.getAs[Number]("km").longValue
      val nlat = ((nk * 1357) % 14000 - 7000) / 100.0
      val nlon = ((nk * 2471) % 34000 - 17000) / 100.0
      // region key of nation nk comes from the data; recompute from the
      // joined row instead: invert via the haversine against all regions
      val cands = (0L to 4L).map { rk =>
        val rlat = ((rk * 3141) % 12000 - 6000) / 100.0
        val rlon = ((rk * 2718) % 30000 - 15000) / 100.0
        val a = math.pow(math.sin(math.toRadians(rlat - nlat) / 2), 2) +
          math.cos(math.toRadians(nlat)) * math.cos(math.toRadians(rlat)) *
            math.pow(math.sin(math.toRadians(rlon - nlon) / 2), 2)
        math.round(2 * 6371000 * math.asin(math.sqrt(a)) / 1000)
      }
      assert(cands.exists(c => math.abs(c - km) <= 1), s"nation $nk km=$km")
    }
  }
}
