package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WKB + GeoPackage-binary codec (G7 in SURVEY §2.5) — the storage-boundary
  * interop format. Internally geometry stays columnar
  * (struct/array, `GeoFunctions`); this codec exists so graph packages can
  * be exported to / imported from GeoPackage-style consumers
  * (header layout per the reference's serialize/deserialize,
  * `feature_table.py:505-510,572-599`: "GP" magic, version 0, flags byte
  * with envelope-absent + little-endian bit, int32 SRID, then ISO WKB).
  */
object Wkb {

  val Srid4326 = 4326
  private val TypePoint = 1
  private val TypeLineString = 2

  // ---- WKB core ----
  def encodeLineString(coords: Seq[Seq[Double]]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + coords.size * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte) // little-endian marker
    buf.putInt(TypeLineString)
    buf.putInt(coords.size)
    coords.foreach { c => buf.putDouble(c(0)); buf.putDouble(c(1)) }
    buf.array()
  }

  def encodePoint(coord: Seq[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte)
    buf.putInt(TypePoint)
    buf.putDouble(coord(0))
    buf.putDouble(coord(1))
    buf.array()
  }

  /** Decode a WKB Point or LineString into its coordinate list
    * (Point → one element). Big- and little-endian accepted.
    */
  def decode(wkb: Array[Byte]): (Int, Seq[Seq[Double]]) = {
    val buf = ByteBuffer.wrap(wkb)
    buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt()
    geomType match {
      case TypePoint =>
        (TypePoint, Seq(Seq(buf.getDouble(), buf.getDouble())))
      case TypeLineString =>
        val n = buf.getInt()
        (TypeLineString, (0 until n).map(_ => Seq(buf.getDouble(), buf.getDouble())))
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  // ---- GeoPackage binary envelope (GP header + WKB) ----
  def encodeGpkg(wkb: Array[Byte], srid: Int = Srid4326): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('P'.toByte)
    buf.put(0.toByte)          // version
    buf.put(0x01.toByte)       // flags: little-endian, no envelope
    buf.putInt(srid)
    buf.put(wkb)
    buf.array()
  }

  def decodeGpkg(gp: Array[Byte]): (Int, Array[Byte]) = {
    require(gp.length > 8 && gp(0) == 'G'.toByte && gp(1) == 'P'.toByte,
      "not GeoPackage binary")
    val flags = gp(3)
    val buf = ByteBuffer.wrap(gp, 4, 4)
    buf.order(if ((flags & 0x01) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val srid = buf.getInt()
    // envelope indicator (flags bits 1-3): external writers (GDAL/QGIS)
    // usually include one; skip it to reach the WKB
    val envBytes = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32 // xy
      case 2 | 3 => 48 // xy + z or m
      case 4 => 64 // xy + z + m
      case e => throw new IllegalArgumentException(s"invalid envelope indicator $e")
    }
    (srid, java.util.Arrays.copyOfRange(gp, 8 + envBytes, gp.length))
  }

  // ---- Column functions (storage-boundary only; not on hot paths) ----
  val lineToGpkgUdf = udf((coords: Seq[Seq[Double]]) =>
    if (coords == null) null else encodeGpkg(encodeLineString(coords)))

  val pointToGpkgUdf = udf((coord: Seq[Double]) =>
    if (coord == null) null else encodeGpkg(encodePoint(coord)))

  val gpkgToCoordsUdf = udf((gp: Array[Byte]) =>
    if (gp == null) null else decode(decodeGpkg(gp)._2)._2)

  def lineToGpkg(coords: Column): Column = lineToGpkgUdf(coords)
  def pointToGpkg(coord: Column): Column = pointToGpkgUdf(coord)
  def gpkgToCoords(gp: Column): Column = gpkgToCoordsUdf(gp)
}
