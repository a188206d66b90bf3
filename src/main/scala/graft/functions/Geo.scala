package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Geometry support: WKB/EWKB decoding to GeoJSON, the reference's geometry
  * column conversion (convertGeometryToGeoJSON, datastream.go:2526-2573 —
  * try EWKB first for the SRID flag, fall back to plain WKB; hex strings may
  * carry a `\x` or `0x` prefix).
  *
  * Pure byte-level Scala — no geometry library ships with Spark. Runs as a
  * scalar UDF; geometry decode is inherently per-value work, and the
  * surrounding projection stays codegen'd.
  *
  * Number formatting uses shortest-round-trip `Double.toString`, which
  * matches engine VARCHAR casts for coordinates in normal ranges (values
  * beyond ~1e7 would print exponent notation — acceptable for lon/lat).
  */
object Geo {

  private val SRID_FLAG = 0x20000000
  private val Z_FLAG = 0x80000000
  private val M_FLAG = 0x40000000

  // ---- WKB parsing -------------------------------------------------------

  /** Parse one WKB/EWKB geometry and render it as a GeoJSON geometry object.
    * Returns null for undecodable input (reference logs-and-nulls too).
    */
  def wkbToGeoJson(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) null
    else try {
      val buf = ByteBuffer.wrap(bytes)
      render(parse(buf))
    } catch { case _: Exception => null }

  /** Hex-string variant (PostGIS text protocol): strips `\x` / `0x`. */
  def hexToGeoJson(hex: String): String =
    if (hex == null) null
    else try {
      val clean = hex.stripPrefix("\\x").stripPrefix("0x")
      wkbToGeoJson(clean.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray)
    } catch { case _: Exception => null }

  private sealed trait Geom
  private final case class Point(xy: Array[Double]) extends Geom
  private final case class Line(pts: Array[Array[Double]]) extends Geom
  private final case class Poly(rings: Array[Array[Array[Double]]]) extends Geom
  private final case class Multi(kind: String, gs: Array[Geom]) extends Geom

  private def parse(buf: ByteBuffer): Geom = {
    val order =
      if (buf.get() == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val rawType = buf.getInt
    // dimensionality comes in two public encodings: EWKB high-bit flags
    // (PostGIS) and ISO-WKB type offsets (1000=Z, 2000=M, 3000=ZM — what
    // SQL Server/MySQL/GDAL emit); support both
    val isoCode = rawType & 0x1fffffff
    val isoDims = isoCode / 1000
    val hasZ = (rawType & Z_FLAG) != 0 || isoDims == 1 || isoDims == 3
    val hasM = (rawType & M_FLAG) != 0 || isoDims == 2 || isoDims == 3
    if ((rawType & SRID_FLAG) != 0) buf.getInt // skip SRID (EWKB)
    val dims = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
    def coord(): Array[Double] = Array.fill(dims)(buf.getDouble)
    def ring(): Array[Array[Double]] = Array.fill(buf.getInt)(coord())
    (isoCode % 1000) match {
      case 1 => Point(coord())
      case 2 => Line(ring())
      case 3 => Poly(Array.fill(buf.getInt)(ring()))
      case 4 => Multi("MultiPoint", Array.fill(buf.getInt)(parse(buf)))
      case 5 => Multi("MultiLineString", Array.fill(buf.getInt)(parse(buf)))
      case 6 => Multi("MultiPolygon", Array.fill(buf.getInt)(parse(buf)))
      case 7 => Multi("GeometryCollection", Array.fill(buf.getInt)(parse(buf)))
      case t => throw new IllegalArgumentException(s"wkb type $t")
    }
  }

  // ---- GeoJSON rendering -------------------------------------------------

  private def num(d: Double): String =
    if (d == Math.rint(d) && math.abs(d) < 1e7) {
      val l = d.toLong
      if (l == 0 && (java.lang.Double.doubleToRawLongBits(d) != 0L)) "-0.0"
      else s"$l.0"
    } else d.toString

  private def coords(xy: Array[Double]): String =
    "[" + xy.map(num).mkString(",") + "]"
  private def ringJson(r: Array[Array[Double]]): String =
    "[" + r.map(coords).mkString(",") + "]"

  private def render(g: Geom): String = g match {
    case Point(xy) => s"""{"type":"Point","coordinates":${coords(xy)}}"""
    case Line(pts) => s"""{"type":"LineString","coordinates":${ringJson(pts)}}"""
    case Poly(rings) =>
      s"""{"type":"Polygon","coordinates":[${rings.map(ringJson).mkString(",")}]}"""
    case Multi("GeometryCollection", gs) =>
      s"""{"type":"GeometryCollection","geometries":[${gs.map(render).mkString(",")}]}"""
    case Multi(kind, gs) =>
      val inner = gs.map {
        case Point(xy) => coords(xy)
        case Line(pts) => ringJson(pts)
        case Poly(rings) => "[" + rings.map(ringJson).mkString(",") + "]"
        case m: Multi => render(m)
      }
      s"""{"type":"$kind","coordinates":[${inner.mkString(",")}]}"""
  }

  // ---- WKB construction (test/ingest helper) -----------------------------

  /** Little-endian WKB for a 2-D point. */
  def pointWkb(lon: Double, lat: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(lon).putDouble(lat)
    buf.array()
  }

  // ---- Spark column functions -------------------------------------------

  val geomToGeoJson = udf(wkbToGeoJson _)
  val geomHexToGeoJson = udf(hexToGeoJson _)
  val mkPointWkb = udf(pointWkb _)
}
