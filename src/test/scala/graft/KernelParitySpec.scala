package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Geo, GeoFunctions, Wkb}

/** The codegen Column forms and the pure-Scala kernel must agree — they
  * are two implementations of the same math (one for scan pipelines, one
  * for driver-side/UDF use).
  */
class KernelParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Column lineLengthMeters equals Scala polylineLength on random polylines") {
    val rnd = new scala.util.Random(7)
    val lines = (1 to 50).map { _ =>
      val n = 2 + rnd.nextInt(6)
      (1 to n).map(_ => Seq(rnd.nextDouble * 358 - 179, rnd.nextDouble * 170 - 85)).toSeq
    }
    val df = lines.toDF("coords")
      .withColumn("len_col", GeoFunctions.lineLengthMeters(col("coords")))
    val got = df.select("len_col").collect().map(_.getDouble(0))
    val want = lines.map(l => Geo.polylineLength(l.map(_.toArray)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-6 * math.max(1.0, w), s"$g vs $w")
    }
  }

  test("Column envelope equals Scala envelope") {
    val line = Seq(Seq(3.0, -1.0), Seq(-2.0, 5.0), Seq(0.5, 2.0))
    val row = Seq(Tuple1(line)).toDF("coords")
      .select(GeoFunctions.envelope(col("coords")).as("e"))
      .select("e.min_x", "e.min_y", "e.max_x", "e.max_y").head
    val (minX, minY, maxX, maxY) = Geo.envelope(line.map(_.toArray))
    assert((row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)) ==
      ((minX, minY, maxX, maxY)))
  }

  test("pointLineDistance UDF equals kernel on candidate geometries") {
    val line = Seq(Seq(-122.3141965, 47.6598870), Seq(-122.3132940, 47.6598762))
    val d = Seq(Tuple1(line)).toDF("coords")
      .select(GeoFunctions.pointLineDistance(-122.3140, 47.6601, col("coords")))
      .head.getDouble(0)
    val want = Geo.pointPolylineDistance(-122.3140, 47.6601, line.map(_.toArray))
    assert(math.abs(d - want) < 1e-9)
  }

  test("WKB decode accepts big-endian payloads") {
    // hand-encode a big-endian WKB point
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte) // big-endian marker
    buf.putInt(1)     // point
    buf.putDouble(12.5)
    buf.putDouble(-3.25)
    val (tpe, coords) = Wkb.decode(buf.array())
    assert(tpe == 1 && coords == Seq(Seq(12.5, -3.25)))
  }

  test("Par.fanOut is a no-op on already-parallel frames") {
    val df = spark.range(1000).repartition(64).toDF("x")
    assert(graft.operators.Par.fanOut(df).rdd.getNumPartitions == 64)
  }

  test("grid cells: query cell set always covers the cells an edge is stored in") {
    val rnd = new scala.util.Random(11)
    val cellDeg = 0.01
    (1 to 100).foreach { _ =>
      val x = rnd.nextDouble * 350 - 175
      val y = rnd.nextDouble * 160 - 80
      val dx = rnd.nextDouble * 0.03
      val dy = rnd.nextDouble * 0.03
      val stored = graft.spatial.Spatial.coveredCells(x, y, x + dx, y + dy, cellDeg)
      val queried = graft.spatial.Spatial.cellsFor(x, y, x + dx, y + dy, cellDeg)
      queried.foreach { q =>
        assert(stored.toSet.subsetOf(q.toSet + graft.spatial.Spatial.CatchAllCell),
          s"stored cells not covered for box ($x,$y,${x + dx},${y + dy})")
      }
    }
  }
}
