package graft.geo

/** Web-Mercator z/x/y tile math (SURVEY.md J7) from 1e-7° fixed point.
  * The double math here is a pure per-row function of its inputs —
  * deterministic across partitionings (no reduction-order dependence). */
object Tiling {
  /** Max Web-Mercator latitude (tiles clamp beyond ±85.0511°). */
  val MaxLat7 = 850511287L

  /** Pack z/x/y into one long: z in top 6 bits, then y, then x (z ≤ 28). */
  @inline def pack(z: Int, tx: Long, ty: Long): Long =
    (z.toLong << 58) | (ty << z) | tx

  @inline def z(t: Long): Int = (t >>> 58).toInt
  @inline def x(t: Long): Long = { val zz = z(t); (t & ((1L << 58) - 1)) & ((1L << zz) - 1) }
  @inline def y(t: Long): Long = { val zz = z(t); (t & ((1L << 58) - 1)) >>> zz }

  /** Tile containing (lat7, lon7) at zoom z (slippy-map convention:
    * x from lon linearly, y from Mercator-projected lat, origin NW). */
  def tile(lat7: Long, lon7: Long, zoom: Int): Long = {
    val n = 1L << zoom
    var tx = ((lon7 - Cells.LonMin) * n) / Cells.LonSpan // exact integer
    if (tx >= n) tx = n - 1
    if (tx < 0) tx = 0
    val clamped = math.max(-MaxLat7, math.min(MaxLat7, lat7))
    val latRad = (clamped / 1e7) * math.Pi / 180.0
    val yNorm = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
    var ty = math.floor(yNorm * n).toLong
    if (ty >= n) ty = n - 1
    if (ty < 0) ty = 0
    pack(zoom, tx, ty)
  }
}
