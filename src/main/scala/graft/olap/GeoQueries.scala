package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.Tables

/** ClickHouse geo-function family (`geohashEncode`, `pointInPolygon`,
  * `greatCircleDistance`) re-expressed Spark-first.
  *
  * Coordinates derive deterministically from keys as 2-dp fixed-point
  * integers (lat100/lon100), so geohash encoding and the polygon test
  * are EXACT integer arithmetic — the bit-interleaving and the
  * cross-product ray casting are generated from one Scala loop into
  * both engines' dialects, keeping the two plans in provable lockstep.
  * Trigonometry appears only in q_geo_dist's terminal haversine, whose
  * result is rounded to whole kilometres over a 25-row nation set (the
  * sub-ULP sin/cos differences between libm builds are ~9 orders of
  * magnitude below the rounding quantum).
  *
  * Scale shape: q_geo is map-only expression work + ONE bounded hash
  * aggregate (≤ 32·32·2 groups); q_geo_dist joins two genuinely bounded
  * relations (nation 25 × region 5 — broadcast is safe at any SF).
  */
object OlapGeoQueries {
  type Q = (SparkSession, String) => DataFrame

  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash-5 (25 bits: lon takes 13, lat 12, alternating from lon's
    * MSB) over fixed-point coords, as one generated integer expression.
    * `shr(x, n)` and `idiv(a, b)` abstract the two SQL dialects. */
  private def geohash5(lonb: String, latb: String,
                       shr: (String, Int) => String,
                       idiv: (String, String) => String): String = {
    val bits =
      (0 to 12).map(j => s"((${shr(lonb, 12 - j)}) & 1) * ${1L << (24 - 2 * j)}") ++
        (0 to 11).map(j => s"((${shr(latb, 11 - j)}) & 1) * ${1L << (23 - 2 * j)}")
    val v25 = bits.mkString("(", " + ", ")")
    (0 to 4).map { k =>
      val code = s"CAST((${idiv(v25, (1L << (20 - 5 * k)).toString)}) % 32 AS INT)"
      s"substr('$B32', $code + 1, 1)"
    }.mkString(" || ")
  }

  /** Test pentagon in (lon100, lat100) fixed-point space — spans enough
    * of the coordinate range that both branches of the parity test are
    * exercised at every SF. */
  private[olap] val Poly: Seq[(Long, Long)] =
    Seq((-12000L, -4000L), (-3000L, 6500L), (5000L, 7500L),
      (14000L, 0L), (2000L, -8000L))

  /** Even-odd ray casting with the division cleared: the edge-crossing
    * inequality x < x1 + (x2-x1)(y-y1)/(y2-y1) is multiplied through by
    * (y2-y1), whose sign is known at generation time, so the test is
    * pure BIGINT products (|terms| ≤ 1.3e9 — no overflow). */
  private def inPoly(x: String, y: String): String = {
    val edges = Poly.zip(Poly.tail :+ Poly.head).map { case ((x1, y1), (x2, y2)) =>
      val straddles = s"(($y1 > $y) <> ($y2 > $y))"
      val dy = y2 - y1
      val lhs = s"(($x) - $x1) * ($dy)"
      val rhs = s"(${x2 - x1}) * (($y) - $y1)"
      val cross = if (dy > 0) s"($lhs < $rhs)" else s"($lhs > $rhs)"
      s"CAST(($straddles AND $cross) AS INT)"
    }
    s"((${edges.mkString(" + ")}) % 2 = 1)"
  }

  private def sparkShr(x: String, n: Int) = s"shiftright($x, $n)"
  private def duckShr(x: String, n: Int) = s"($x >> $n)"
  private def sparkDiv(a: String, b: String) = s"$a div $b"
  private def duckDiv(a: String, b: String) = s"$a // $b"

  /** Fixed-point coordinate derivation (shared SQL text — pure integer
    * arithmetic, identical in both dialects). Lat avoids the poles and
    * lon avoids the antimeridian so geohash cell edges stay generic. */
  private val CustLat = "(c_custkey * 9973) % 17000 - 8500"
  private val CustLon = "(c_custkey * 7919) % 35900 - 17950"

  /** The per-customer point frame (gh5, in_poly, lat100, lon100) —
    * package-visible so the spec can check every point against an
    * independent decoder. */
  private[olap] def points(s: SparkSession, dir: String): DataFrame = {
    val latb = s"(($CustLat) + 9000) * 4096 div 18000"
    val lonb = s"(($CustLon) + 18000) * 8192 div 36000"
    Tables(s, dir, "customer")
      .select(
        F.expr(geohash5(lonb, latb, sparkShr, sparkDiv)).as("gh5"),
        F.expr(inPoly(CustLon, CustLat)).as("in_poly"),
        F.expr(CustLat).as("lat100"),
        F.expr(CustLon).as("lon100"))
  }

  /** q_geo: per-customer geohashEncode + pointInPolygon, rolled up by
    * (2-char geohash cell, polygon membership). */
  def qGeo(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .groupBy(F.substring(F.col("gh5"), 1, 2).as("gh2"), F.col("in_poly"))
      .agg(F.count(F.lit(1)).as("n"),
        F.countDistinct(F.col("gh5")).as("n_gh5"),
        F.min(F.col("gh5")).as("min_gh5"),
        F.min(F.col("lat100")).as("min_lat100"),
        F.max(F.col("lon100")).as("max_lon100"))

  val qGeoSql: String = {
    val latb = s"((($CustLat) + 9000) * 4096) // 18000"
    val lonb = s"((($CustLon) + 18000) * 8192) // 36000"
    s"""WITH pts AS (
       |  SELECT ${geohash5(lonb, latb, duckShr, duckDiv)} AS gh5,
       |    ${inPoly(CustLon, CustLat)} AS in_poly,
       |    $CustLat AS lat100, $CustLon AS lon100
       |  FROM customer)
       |SELECT substr(gh5, 1, 2) AS gh2, in_poly, COUNT(*) AS n,
       |  COUNT(DISTINCT gh5) AS n_gh5, min(gh5) AS min_gh5,
       |  min(lat100) AS min_lat100, max(lon100) AS max_lon100
       |FROM pts GROUP BY 1, 2""".stripMargin
  }

  private val NatLat = "(n_nationkey * 1357) % 14000 - 7000"
  private val NatLon = "(n_nationkey * 2471) % 34000 - 17000"
  private val RegLat = "(r_regionkey * 3141) % 12000 - 6000"
  private val RegLon = "(r_regionkey * 2718) % 30000 - 15000"

  /** Haversine great-circle metres on the 6371 km mean sphere — the
    * identical formula text runs on both engines; emitted as whole km. */
  private def haversineKm(lat1: String, lon1: String,
                          lat2: String, lon2: String): String =
    s"""CAST(round(2 * 6371000 * asin(sqrt(
       |  pow(sin((radians($lat2) - radians($lat1)) / 2), 2) +
       |  cos(radians($lat1)) * cos(radians($lat2)) *
       |    pow(sin((radians($lon2) - radians($lon1)) / 2), 2))) / 1000)
       |AS BIGINT)""".stripMargin

  /** q_geo_dist: greatCircleDistance from each nation's centroid to its
    * region's anchor point. */
  def qGeoDist(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables(s, dir, "nation")
      .select(F.col("n_nationkey").as("nk"), F.col("n_name"),
        F.col("n_regionkey"),
        (F.expr(NatLat) / 100.0).as("nlat"), (F.expr(NatLon) / 100.0).as("nlon"))
    val region = Tables(s, dir, "region")
      .select(F.col("r_regionkey"), F.col("r_name"),
        (F.expr(RegLat) / 100.0).as("rlat"), (F.expr(RegLon) / 100.0).as("rlon"))
    nation.join(F.broadcast(region), F.col("n_regionkey") === F.col("r_regionkey"))
      .select(F.col("nk"), F.col("n_name"), F.col("r_name"),
        F.expr(haversineKm("nlat", "nlon", "rlat", "rlon")).as("km"))
  }

  val qGeoDistSql: String =
    s"""WITH n AS (
       |  SELECT n_nationkey AS nk, n_name, n_regionkey,
       |    ($NatLat) / 100.0 AS nlat, ($NatLon) / 100.0 AS nlon
       |  FROM nation),
       |r AS (
       |  SELECT r_regionkey, r_name,
       |    ($RegLat) / 100.0 AS rlat, ($RegLon) / 100.0 AS rlon
       |  FROM region)
       |SELECT nk, n_name, r_name,
       |  ${haversineKm("nlat", "nlon", "rlat", "rlon")} AS km
       |FROM n JOIN r ON n_regionkey = r_regionkey""".stripMargin

  /** q_geohash_box: ClickHouse `geohashesInBox` — the precision-2 cells
    * covering each nation's customer bounding box. The 1024 candidate
    * cells enumerate from one `range`; each cell id de-interleaves into
    * (lon5, lat5) by bit sums, its bounds are EXACT integers (lon in the
    * ×100 space, span 36000/32 = 1125; lat doubled into a ×200 space so
    * 18000/32 stays integral), and the box intersection is four integer
    * comparisons — consistent with geohash5's bit layout, so every
    * point's own gh2 prefix provably lands inside its nation's cover.
    * 25 bboxes × 1024 cells ride one broadcast nested-loop (bounded by
    * construction at any SF). */
  def qGeohashBox(s: SparkSession, dir: String): DataFrame = {
    val bbox = Tables(s, dir, "customer")
      .select(F.col("c_nationkey").cast("long").as("nation"),
        F.expr(CustLat).as("lat100"), F.expr(CustLon).as("lon100"))
      .groupBy("nation")
      .agg(F.min("lon100").as("lon_min"), F.max("lon100").as("lon_max"),
        F.min("lat100").as("lat_min"), F.max("lat100").as("lat_max"))
    val deint = (off: Int) =>
      (0 to 4).map(j => s"((c div ${1L << (2 * j + off)}) % 2) * ${1L << j}")
        .mkString(" + ")
    val cells = s.range(0, 1024).toDF("c")
      .withColumn("lon5", F.expr(deint(1)))
      .withColumn("lat5", F.expr(deint(0)))
      .withColumn("lon_lo", F.expr("-18000 + lon5 * 1125"))
      .withColumn("lat_lo200", F.expr("-18000 + lat5 * 1125"))
      .withColumn("gh2", F.expr(
        s"concat(substr('$B32', cast(c div 32 as int) + 1, 1), " +
          s"substr('$B32', cast(c % 32 as int) + 1, 1))"))
    bbox.join(F.broadcast(cells),
        F.expr("lon_lo <= lon_max AND lon_lo + 1125 > lon_min AND " +
          "lat_lo200 <= 2 * lat_max AND lat_lo200 + 1125 > 2 * lat_min"))
      .groupBy("nation")
      .agg(F.count(F.lit(1)).as("n_cells"),
        F.min("gh2").as("min_cell"), F.max("gh2").as("max_cell"))
  }

  val qGeohashBoxSql: String = {
    def deint(off: Int) =
      (0 to 4).map(j => s"((c // ${1L << (2 * j + off)}) % 2) * ${1L << j}")
        .mkString(" + ")
    s"""WITH bbox AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |   MIN($CustLon) AS lon_min, MAX($CustLon) AS lon_max,
       |   MIN($CustLat) AS lat_min, MAX($CustLat) AS lat_max
       |  FROM customer GROUP BY 1),
       |cells AS (
       |  SELECT c, ${deint(1)} AS lon5, ${deint(0)} AS lat5,
       |   -18000 + (${deint(1)}) * 1125 AS lon_lo,
       |   -18000 + (${deint(0)}) * 1125 AS lat_lo200,
       |   substr('$B32', CAST(c // 32 AS INTEGER) + 1, 1) ||
       |     substr('$B32', CAST(c % 32 AS INTEGER) + 1, 1) AS gh2
       |  FROM (SELECT UNNEST(range(0, 1024)) AS c))
       |SELECT nation, COUNT(*) AS n_cells,
       | MIN(gh2) AS min_cell, MAX(gh2) AS max_cell
       |FROM bbox JOIN cells
       |  ON lon_lo <= lon_max AND lon_lo + 1125 > lon_min
       | AND lat_lo200 <= 2 * lat_max AND lat_lo200 + 1125 > 2 * lat_min
       |GROUP BY 1""".stripMargin
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_geo", qGeo _, Some(qGeoSql)),
    ("q_geohash_box", qGeohashBox _, Some(qGeohashBoxSql)),
    ("q_geo_dist", qGeoDist _, Some(qGeoDistSql)))
}
