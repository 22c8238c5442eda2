package graft.geo

/** Pure-Scala geometry kernel (no Spark dependencies).
  *
  * Replaces the reference's pyproj/shapely stack
  * (`feature_table.py:19-23,223-229`) with direct great-circle /
  * local-equirectangular math so distance evaluation stays inside executor
  * code (and can later be promoted to a codegen'd Catalyst expression).
  */
object Geo {
  /** Mean Earth radius in meters, matching the reference (`utils.py:12`). */
  val EarthRadiusM: Double = 6371000.0

  /** Meters per degree of latitude (and of longitude at the equator). */
  val MetersPerDeg: Double = EarthRadiusM * math.Pi / 180.0

  /** Great-circle distance between two lon/lat points, meters
    * (ref `utils.py:4-33`).
    */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = math.toRadians(lat1)
    val p2 = math.toRadians(lat2)
    val dp = p2 - p1
    val dl = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dp / 2), 2) +
      math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
    2 * EarthRadiusM * math.asin(math.sqrt(a))
  }

  /** Polyline length in meters: pairwise haversine sum (ref `utils.py:7-33`). */
  def polylineLength(coords: Seq[Array[Double]]): Double =
    if (coords.size < 2) 0.0
    else coords.sliding(2).map { case Seq(a, b) =>
      haversine(a(0), a(1), b(0), b(1))
    }.sum

  /** Point-to-segment distance in a local equirectangular projection
    * centered on the query point — the same "project to meters, measure
    * planar" scheme the reference uses via EPSG:3740 + shapely
    * (`feature_table.py:198-235`), but with no CRS registry dependency.
    * Accurate to well under 0.1% at query-radius scales (<10 km).
    */
  def pointSegmentDistance(
      lon: Double, lat: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val cosLat = math.cos(math.toRadians(lat))
    // planar coords in meters relative to the query point
    val x1 = (ax - lon) * cosLat * MetersPerDeg
    val y1 = (ay - lat) * MetersPerDeg
    val x2 = (bx - lon) * cosLat * MetersPerDeg
    val y2 = (by - lat) * MetersPerDeg
    val dx = x2 - x1
    val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0, -(x1 * dx + y1 * dy) / len2))
    val px = x1 + t * dx
    val py = y1 + t * dy
    math.sqrt(px * px + py * py)
  }

  /** Min distance (meters) from a lon/lat point to a polyline. */
  def pointPolylineDistance(lon: Double, lat: Double, coords: Seq[Array[Double]]): Double =
    if (coords.isEmpty) Double.NaN
    else if (coords.size == 1) {
      val c = coords.head
      pointSegmentDistance(lon, lat, c(0), c(1), c(0), c(1))
    } else coords.sliding(2).map { case Seq(a, b) =>
      pointSegmentDistance(lon, lat, a(0), a(1), b(0), b(1))
    }.min

  /** Format a coordinate exactly like Python's `f"{round(x, p)}"`
    * (ref `io.py:21-29`): decimal-round to `p` places (ties to even, on the
    * exact binary value), shortest decimal form, trailing zeros stripped but
    * at least one decimal digit kept.
    */
  def fmtCoord(x: Double, precision: Int): String = {
    val rounded = new java.math.BigDecimal(x)
      .setScale(precision, java.math.RoundingMode.HALF_EVEN)
      .stripTrailingZeros()
    val s = rounded.toPlainString
    if (s.contains('.')) s else s + ".0"
  }

  /** Node id = `"{lon}, {lat}"` of the rounded coordinate (ref `io.py:21-29`). */
  def nodeId(lon: Double, lat: Double, precision: Int): String =
    s"${fmtCoord(lon, precision)}, ${fmtCoord(lat, precision)}"

  /** Envelope (minX, minY, maxX, maxY) of a polyline (ref R-tree MBR rows,
    * `feature_table.py:301-311`).
    */
  def envelope(coords: Seq[Array[Double]]): (Double, Double, Double, Double) = {
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    coords.foreach { c =>
      if (c(0) < minX) minX = c(0); if (c(0) > maxX) maxX = c(0)
      if (c(1) < minY) minY = c(1); if (c(1) > maxY) maxY = c(1)
    }
    (minX, minY, maxX, maxY)
  }
}
