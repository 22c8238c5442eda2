package graft.ingest

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.Element

/** OpenStreetMap XML (`.osm`) → canonical edges DataFrame. OSM is the
  * native source of the reference's domain data (street/sidewalk
  * networks); its ingest surface reads any fiona/OGR-supported format
  * (`io.py:10-13`), and OGR's OSM driver exposes ways as a `lines`
  * layer. This reader replicates that view Spark-side with the JDK XML
  * stack (hardened via [[KmlIngest.secureBuilder]]).
  *
  * Model: `<node>` elements carry (id, lon, lat); `<way>` elements carry
  * ordered `<nd ref=…>` node references plus `<tag k v>` attributes. A
  * way becomes one LineString feature whose coordinates are its resolved
  * node positions in order; ways with fewer than two resolvable refs are
  * skipped, as are closed ways tagged `area=yes` (polygons in OGR's
  * model, not lines). Tags flatten to dynamic property columns
  * (number-sniffed, like the KML/GML readers — richer than OGR's
  * `other_tags` hstore but the same information), plus `osm_id`.
  *
  * The resulting features feed the exact [[GeoJsonIngest]] pipeline, so
  * node-id formatting, reverse edges, sign flips, `_length`, fids and
  * property schema are byte-identical to a GeoJSON build of the same
  * ways. One task per file; the 100 TB path remains newline-delimited
  * GeoJSON (or pre-converted parquet), which splits within files.
  */
object OsmIngest {

  /** Read one or more `.osm` XML files into the canonical edges frame
    * (same schema and options as [[GeoJsonIngest.readEdges]]).
    */
  def readEdges(spark: SparkSession, paths: Seq[String],
      opts: GeoJsonIngest.Options = GeoJsonIngest.Options()): DataFrame = {
    require(paths.nonEmpty, "no osm paths")
    val lines = spark.sparkContext.parallelize(paths, paths.size).flatMap { p =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      val in = fs.open(path)
      val bytes =
        try {
          val len = fs.getFileStatus(path).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          buf
        } finally in.close()
      featureJsonLines(bytes, path.getName.replaceAll("(?i)\\.osm$", ""))
    }
    import spark.implicits._
    val raw = spark.read.json(spark.createDataset(lines))
    require(raw.schema.fieldNames.contains("geometry"),
      s"no parseable OSM ways in $paths")
    val feats = raw
      .select(col("_layer"), col("pos"),
        struct(col("geometry"), col("properties")).as("f"))
      .filter(col("f.geometry.type") === "LineString")
    GeoJsonIngest.fromFeatures(feats, GeoJsonIngest.propsOf(raw.schema), opts,
      GeoJsonIngest.denseByGate(spark, paths, opts))
  }

  /** GeoJSON Feature JSON lines for every line-like way. */
  private[graft] def featureJsonLines(xml: Array[Byte], layer: String): Iterator[String] = {
    val doc = KmlIngest.secureBuilder().parse(new ByteArrayInputStream(xml))
    val nodeEls = doc.getElementsByTagNameNS("*", "node")
    val nodePos = new scala.collection.mutable.HashMap[Long, (Double, Double)]()
    (0 until nodeEls.getLength).foreach { i =>
      val n = nodeEls.item(i).asInstanceOf[Element]
      try nodePos(n.getAttribute("id").toLong) =
        (n.getAttribute("lon").toDouble, n.getAttribute("lat").toDouble)
      catch { case _: NumberFormatException => () }
    }
    val wayEls = doc.getElementsByTagNameNS("*", "way")
    (0 until wayEls.getLength).iterator.flatMap { i =>
      val w = wayEls.item(i).asInstanceOf[Element]
      val children = {
        val nl = w.getChildNodes
        (0 until nl.getLength).map(nl.item).collect { case e: Element => e }
      }
      val coords = children.filter(_.getLocalName == "nd").flatMap { nd =>
        scala.util.Try(nd.getAttribute("ref").toLong).toOption.flatMap(nodePos.get)
      }
      val tags = children.filter(_.getLocalName == "tag")
        .map(t => t.getAttribute("k") -> t.getAttribute("v"))
        .filter(_._1.nonEmpty)
      val closed = coords.length >= 2 && coords.head == coords.last
      val isArea = closed && tags.exists { case (k, v) => k == "area" && v == "yes" }
      if (coords.length < 2 || isArea) Iterator.empty
      else {
        val id = scala.util.Try(w.getAttribute("id").toLong).toOption.getOrElse(0L)
        Iterator(featureLine(layer, i + 1L, id, tags, coords))
      }
    }
  }

  /** One GeoJSON Feature line for a resolved way — shared by the XML and
    * PBF readers so both formats render (and therefore type-sniff and
    * schema-infer) identically. `osm_id` leads, then tags in the given
    * order.
    */
  private[ingest] def featureLine(layer: String, pos: Long, osmId: Long,
      tags: Iterable[(String, String)], coords: Seq[(Double, Double)]): String = {
    import ShapefileIngest.{fmtDouble, jsonString}
    val props = scala.collection.mutable.LinkedHashMap[String, String]()
    props("osm_id") = osmId.toString
    tags.foreach { case (k, v) => if (k.nonEmpty) props(k) = sniffJson(v) }
    val coordJson = coords.map(c =>
      s"[${fmtDouble(c._1)},${fmtDouble(c._2)}]").mkString("[", ",", "]")
    val propJson = props.map { case (k, vj) => s"${jsonString(k)}:$vj" }
      .mkString(""","properties":{""", ",", "}")
    s"""{"_layer":${jsonString(layer)},"pos":$pos,""" +
      s""""geometry":{"type":"LineString","coordinates":$coordJson}$propJson}"""
  }

  /** OSM tag values are untyped text: emit a JSON number when the text
    * is one, a string otherwise (same sniff as KML/GML).
    */
  private def sniffJson(raw: String): String = {
    import ShapefileIngest.{fmtDouble, jsonString}
    if (raw.matches("[+-]?\\d+"))
      try raw.toLong.toString catch { case _: NumberFormatException => jsonString(raw) }
    else if (raw.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?"))
      try fmtDouble(raw.toDouble) catch { case _: NumberFormatException => jsonString(raw) }
    else jsonString(raw)
  }
}
