package graft.extract

/** Pure per-route geometry kernels from the Tegallega extraction pipeline
  * (update-routes.js). Kept as plain Scala over small arrays: each runs on
  * ONE route's geometry (bounded, ~10²–10³ points), inside a typed per-group
  * Spark operator — data-parallel across routes, sequential within a route
  * exactly like the reference requires.
  *
  * Reference fidelity notes (SURVEY §7.4 #6): segment projection parameter
  * `t` is computed in raw lon/lat space but distance via haversine meters —
  * mathematically inconsistent, but that IS the spec.
  */
object GeoKernels {

  type Coord = (Double, Double) // (lon, lat)

  /** Haversine meters, atan2 form (update-routes.js:188-203, R=6371e3). */
  def haversineM(a: Coord, b: Coord): Double = {
    val R = 6371e3
    val phi1 = a._2 * math.Pi / 180
    val phi2 = b._2 * math.Pi / 180
    val dPhi = (b._2 - a._2) * math.Pi / 180
    val dLam = (b._1 - a._1) * math.Pi / 180
    val s = math.sin(dPhi / 2) * math.sin(dPhi / 2) +
      math.cos(phi1) * math.cos(phi2) * math.sin(dLam / 2) * math.sin(dLam / 2)
    // s can exceed 1 by an ulp for near-antipodal pairs; without the
    // clamp sqrt(1-s) is NaN, which silently poisons every comparison
    // downstream (a NaN distance LOSES a < argmin, so the segment is
    // skipped instead of measured). Clamped, the result is the correct
    // antipodal limit π·R. SQL mirrors clamp the same way (GREATEST).
    R * 2 * math.atan2(math.sqrt(s), math.sqrt(math.max(0.0, 1 - s)))
  }

  /** X13 (update-routes.js:106-108). */
  def coordsEqual(a: Coord, b: Coord, tol: Double = 1e-6): Boolean =
    math.abs(a._1 - b._1) < tol && math.abs(a._2 - b._2) < tol

  /** J6: project a point onto a linestring (update-routes.js:206-246).
    * Returns (fractionalIndex = segment + clamped t, distance meters).
    * Zero-length segments compare at their start point with t=0.
    */
  def projectPointToLine(p: Coord, line: IndexedSeq[Coord]): (Double, Double) = {
    var minDist = Double.PositiveInfinity
    var minIndex = -1
    var minT = 0.0
    var i = 0
    while (i < line.length - 1) {
      val p1 = line(i); val p2 = line(i + 1)
      val dx = p2._1 - p1._1
      val dy = p2._2 - p1._2
      val lenSq = dx * dx + dy * dy
      if (lenSq == 0) {
        val d = haversineM(p, p1)
        if (d < minDist) { minDist = d; minIndex = i; minT = 0.0 }
      } else {
        var t = ((p._1 - p1._1) * dx + (p._2 - p1._2) * dy) / lenSq
        t = math.max(0, math.min(1, t))
        val proj = (p1._1 + t * dx, p1._2 + t * dy)
        val d = haversineM(p, proj)
        if (d < minDist) { minDist = d; minIndex = i; minT = t }
      }
      i += 1
    }
    (minIndex + minT, minDist)
  }

  /** W8: stitch member-ordered ways into one linestring
    * (update-routes.js:111-141): reverse a way when its END (not start)
    * touches the running end within 1e-6; drop the duplicated joint
    * coordinate; discontinuities keep both coords (reference just warns).
    */
  def stitchWays(ways: Seq[IndexedSeq[Coord]]): IndexedSeq[Coord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Coord]
    var lastCoord: Option[Coord] = None
    ways.foreach { wayCoords =>
      var coords = wayCoords
      lastCoord.foreach { lc =>
        val matchesStart = coordsEqual(coords.head, lc)
        val matchesEnd = coordsEqual(coords.last, lc)
        if (!matchesStart && matchesEnd) coords = coords.reverse
        // !matchesStart && !matchesEnd → discontinuity; reference warns only
      }
      val effective = if (out.nonEmpty) coords.tail else coords
      out ++= effective
      // reference: lastCoord = coords[coords.length-1] of the POST-slice
      // array — undefined (→ no check next round) when it came up empty.
      lastCoord = effective.lastOption
    }
    out.toIndexedSeq
  }

  final case class Stop(id: String, name: String, role: String,
                        lon: Double, lat: Double, isReal: Boolean)

  /** G5-adjacent interpolation on the line at fractional index
    * (update-routes.js:299-307). None when the index leaves the line.
    */
  def interpolateAt(line: IndexedSeq[Coord], idx: Double): Option[Coord] = {
    val coordIdx = math.floor(idx).toInt
    val t = idx - coordIdx
    if (coordIdx < 0 || coordIdx >= line.length - 1) None
    else {
      val c1 = line(coordIdx); val c2 = line(coordIdx + 1)
      Some((c1._1 + t * (c2._1 - c1._1), c1._2 + t * (c2._2 - c1._2)))
    }
  }

  /** G5: slice the line between two fractional indices (the rendering
    * path-segment extraction, index.html:241-247 / turf.lineSlice in
    * spirit): interpolated endpoints plus the whole vertices between them.
    */
  def lineSlice(line: IndexedSeq[Coord], fromIdx: Double, toIdx: Double): IndexedSeq[Coord] = {
    val (a, b) = if (fromIdx <= toIdx) (fromIdx, toIdx) else (toIdx, fromIdx)
    val start = interpolateAt(line, a).orElse(line.headOption)
    val end = interpolateAt(line, b).orElse(line.lastOption)
    val mid = line.zipWithIndex
      .filter { case (_, i) => i > a && i < b }
      .map(_._1)
    (start.toIndexedSeq ++ mid ++ end.toIndexedSeq).distinct
  }

  /** W10 + J9 + W6 + W7: full angkot stop synthesis for one route
    * (update-routes.js:249-376):
    *  1. between each consecutive real-stop pair further apart than 250 m,
    *     insert floor(d/0.25km) virtual stops evenly spaced in fractional-
    *     index space, skipping any within 150 m of some real stop (J9);
    *  2. names come from a first-wins exact-coordinate map (J8);
    *  3. sort all stops by fractional index along the line (W6);
    *  4. sweep: keep a stop iff real, first, or ≥150 m after the last KEPT
    *     stop (W7).
    */
  def synthesizeStops(line: IndexedSeq[Coord], realStops: Seq[Stop],
                      coordToName: Map[(Double, Double), String]): Seq[Stop] = {
    val MaxKm = 0.25
    val MinKm = 0.15

    val virtual = realStops.iterator.sliding(2).withPartial(false).flatMap {
      case Seq(start, end) =>
        val startIdx = projectPointToLine((start.lon, start.lat), line)._1
        val endIdx = projectPointToLine((end.lon, end.lat), line)._1
        val distKm = haversineM((start.lon, start.lat), (end.lon, end.lat)) / 1000
        if (distKm <= MaxKm) Seq.empty
        else {
          val n = math.floor(distKm / MaxKm).toInt
          val step = (endIdx - startIdx) / (n + 1)
          (1 to n).flatMap { i =>
            interpolateAt(line, startIdx + i * step).flatMap { case (lon, lat) =>
              val tooClose = realStops.exists(r =>
                haversineM((lon, lat), (r.lon, r.lat)) < MinKm * 1000)
              if (tooClose) None
              else Some(Stop(
                id = f"virtual_${lon}%.4f_${lat}%.4f",
                name = coordToName.getOrElse((lon, lat), "Jalan terdekat"),
                role = "virtual", lon = lon, lat = lat, isReal = false))
            }
          }
        }
      case _ => Seq.empty
    }.toSeq

    val sorted = (realStops ++ virtual)
      .map(s => (s, projectPointToLine((s.lon, s.lat), line)._1))
      .sortBy(_._2)
      .map(_._1)

    val kept = scala.collection.mutable.ArrayBuffer.empty[Stop]
    var last: Option[Stop] = None
    sorted.foreach { s =>
      val ok = last.isEmpty || s.isReal ||
        haversineM((last.get.lon, last.get.lat), (s.lon, s.lat)) >= MinKm * 1000
      if (ok) { kept += s; last = Some(s) }
    }
    kept.toSeq
  }
}
