package graft.ingest

import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OpenStreetMap PBF (`.osm.pbf`) → canonical edges DataFrame, decoded
  * against the public OSM PBF format specification
  * (wiki.openstreetmap.org/wiki/PBF_Format) with a minimal protobuf wire
  * reader — no generated classes, no codec dependencies beyond the JDK's
  * zlib.
  *
  * Unlike the DOM-based XML readers, PBF is built for planet-scale data
  * and this reader keeps that property Spark-side:
  *
  *  - the file is a sequence of independently-decodable blobs; the
  *    driver scans ONLY the ~20-byte blob headers to enumerate
  *    `(offset, size)` ranges, then each blob decodes in its own task —
  *    a 60 GB planet file fans out across the cluster without any
  *    single-JVM DOM or byte-array materialization;
  *  - ways reference node ids that may live in ANY blob, so coordinate
  *    resolution is a distributed join (explode refs → join node
  *    positions → regroup in ref order), not a per-file hash map — the
  *    planet's ~9B nodes never need to fit anywhere.
  *
  * The resolved ways render as GeoJSON feature lines feeding the exact
  * [[GeoJsonIngest]] pipeline, so node-id formatting, reverse edges,
  * sign flips, `_length`, fids and dynamic property schema are
  * byte-identical to a GeoJSON/XML build of the same data
  * (OsmPbfSpec proves row identity against [[OsmIngest]]). Tag model and
  * the closed-`area=yes` polygon skip match the `.osm` XML reader
  * (parity with OGR's `lines` layer view, ref `io.py:10-13`).
  */
object OsmPbfIngest {

  /** Read one or more `.osm.pbf` files into the canonical edges frame
    * (same schema and options as [[GeoJsonIngest.readEdges]]).
    */
  def readEdges(spark: SparkSession, paths: Seq[String],
      opts: GeoJsonIngest.Options = GeoJsonIngest.Options()): DataFrame = {
    import spark.implicits._
    require(paths.nonEmpty, "no osm.pbf paths")

    // driver pass: headers only — (path, layer, blobOffset, blobSize)
    val blobs: Seq[(String, String, Long, Int)] = paths.flatMap { p =>
      val layer = new org.apache.hadoop.fs.Path(p).getName
        .replaceAll("(?i)\\.osm\\.pbf$|\\.pbf$", "")
      enumerateDataBlobs(p).map { case (off, len) => (p, layer, off, len) }
    }
    require(blobs.nonEmpty, s"no OSMData blobs in $paths")

    val blobDs = spark.createDataset(blobs)
      .repartition(math.min(blobs.size, spark.sparkContext.defaultParallelism))

    // each task decodes its blob range: node positions + raw ways
    val decoded = blobDs.flatMap { case (path, layer, off, len) =>
      val block = readBlob(path, off, len)
      val (nodes, ways) = decodePrimitiveBlock(block)
      nodes.iterator.map(n => ("n", layer, n._1, n._2, n._3,
        Array.empty[Long], Map.empty[String, String])) ++
        ways.iterator.map(w => ("w", layer, w.id, 0.0, 0.0, w.refs, w.tags))
    }.toDF("kind", "_layer", "id", "lon", "lat", "refs", "tags")

    val nodes = decoded.filter(col("kind") === "n")
      .select(col("id").as("ref"), col("lon"), col("lat"))
    val ways = decoded.filter(col("kind") === "w")
      .select(col("_layer"), col("id"), col("refs"), col("tags"))

    // distributed resolution: refs explode positionally, join node
    // positions on the id (shuffle on ref — the planet-scale path),
    // regroup in ref order. Unresolvable refs drop, matching the XML
    // reader's nodePos.get flatMap.
    val resolved = ways
      .select(col("_layer"), col("id"), col("tags"),
        posexplode(col("refs")).as(Seq("ref_pos", "ref")))
      .join(nodes, Seq("ref"))
      .groupBy("_layer", "id")
      .agg(first(col("tags")).as("tags"),
        sort_array(collect_list(struct(col("ref_pos"), col("lon"),
          col("lat")))).as("pts"))
      .select(col("_layer"), col("id"), col("tags"),
        expr("transform(pts, p -> array(p.lon, p.lat))").as("coords"))
      .filter(size(col("coords")) >= 2)
      // polygon parity: closed ways tagged area=yes are OGR polygons
      .filter(!(col("coords").getItem(0) === element_at(col("coords"), -1) &&
        coalesce(col("tags").getItem("area"), lit("")) === "yes"))

    // render GeoJSON feature lines → the shared dynamic-schema pipeline.
    // pos orders fids by (way id) within the layer — the PBF contract
    // keeps ways sorted, so this matches document order of an XML dump.
    // The rendering runs the SAME Scala helpers as the XML readers
    // (jsonString/fmtDouble/sniffJson), so downstream bytes are identical
    // by construction.
    val lines = resolved
      .withColumn("pos", row_number().over(
        Window.partitionBy("_layer").orderBy("id")))
      .select(col("_layer"), col("pos").cast("long"), col("id"),
        col("tags"), col("coords"))
      .as[(String, Long, Long, Map[String, String], Seq[Seq[Double]])]
      .map { case (layer, pos, id, tags, coords) =>
        OsmIngest.featureLine(layer, pos, id, tags,
          coords.map(c => (c(0), c(1))))
      }

    val raw = spark.read.json(lines)
    require(raw.schema.fieldNames.contains("geometry"),
      s"no parseable OSM ways in $paths")
    val feats = raw
      .select(col("_layer"), col("pos"),
        struct(col("geometry"), col("properties")).as("f"))
      .filter(col("f.geometry.type") === "LineString")
    GeoJsonIngest.fromFeatures(feats, GeoJsonIngest.propsOf(raw.schema), opts,
      GeoJsonIngest.denseByGate(spark, paths, opts))
  }

  // ---------------------------------------------------------------------
  // file framing
  // ---------------------------------------------------------------------

  /** Scan blob headers (driver-side, ~20 bytes per blob): returns
    * (offset, size) of every OSMData blob body.
    */
  private[ingest] def enumerateDataBlobs(p: String): Seq[(Long, Int)] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val fileLen = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    try {
      val out = Seq.newBuilder[(Long, Int)]
      var pos = 0L
      val lenBuf = new Array[Byte](4)
      while (pos + 4 <= fileLen) {
        in.readFully(pos, lenBuf)
        val headerLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
          ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
        require(headerLen > 0 && headerLen < 64 * 1024,
          s"corrupt BlobHeader length $headerLen at $pos in $p")
        val hdr = new Array[Byte](headerLen)
        in.readFully(pos + 4, hdr)
        var (blobType, dataSize) = ("", -1)
        val r = new Reader(hdr)
        while (r.hasNext) r.next() match {
          case (1, WireBytes) => blobType = new String(r.bytes(), "UTF-8")
          case (3, WireVarint) => dataSize = r.varint().toInt
          case other => r.skip(other._2)
        }
        require(dataSize >= 0, s"BlobHeader without datasize at $pos in $p")
        if (blobType == "OSMData") out += ((pos + 4 + headerLen, dataSize))
        pos += 4 + headerLen + dataSize
      }
      out.result()
    } finally in.close()
  }

  /** Read + decompress one blob body into a PrimitiveBlock byte array. */
  private[ingest] def readBlob(p: String, off: Long, len: Int): Array[Byte] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(path)
    val buf = new Array[Byte](len)
    try in.readFully(off, buf) finally in.close()
    var raw: Array[Byte] = null
    var zlib: Array[Byte] = null
    var rawSize = -1
    val r = new Reader(buf)
    while (r.hasNext) r.next() match {
      case (1, WireBytes) => raw = r.bytes()
      case (2, WireVarint) => rawSize = r.varint().toInt
      case (3, WireBytes) => zlib = r.bytes()
      case (f, w) =>
        require(w != WireBytes || (f != 4 && f != 6 && f != 7),
          s"unsupported blob compression (field $f); only raw/zlib")
        r.skip(w)
    }
    if (raw != null) raw
    else {
      require(zlib != null, "blob carries neither raw nor zlib_data")
      val inf = new Inflater()
      inf.setInput(zlib)
      val out = new Array[Byte](if (rawSize >= 0) rawSize else zlib.length * 8)
      var n = 0
      while (!inf.finished() && n < out.length) n += inf.inflate(out, n, out.length - n)
      inf.end()
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
  }

  // ---------------------------------------------------------------------
  // PrimitiveBlock decoding
  // ---------------------------------------------------------------------

  private[ingest] final case class RawWay(id: Long, refs: Array[Long],
    tags: Map[String, String])

  /** Decode nodes (id, lon, lat) and ways from one PrimitiveBlock. */
  private[ingest] def decodePrimitiveBlock(
      block: Array[Byte]): (Seq[(Long, Double, Double)], Seq[RawWay]) = {
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    val strings = Seq.newBuilder[String]
    val groups = Seq.newBuilder[Array[Byte]]
    val r = new Reader(block)
    while (r.hasNext) r.next() match {
      case (1, WireBytes) => // stringtable: repeated field 1 bytes
        val st = new Reader(r.bytes())
        while (st.hasNext) st.next() match {
          case (1, WireBytes) => strings += new String(st.bytes(), "UTF-8")
          case other => st.skip(other._2)
        }
      case (2, WireBytes) => groups += r.bytes()
      case (17, WireVarint) => granularity = r.varint()
      case (19, WireVarint) => latOffset = r.varint()
      case (20, WireVarint) => lonOffset = r.varint()
      case other => r.skip(other._2)
    }
    val table = strings.result().toIndexedSeq
    // nanodegrees → degrees via EXACT decimal scaling (not a 1e-9 double
    // multiply, which can land 1 ulp off): the result is the correctly
    // rounded double of the decimal coordinate, bit-identical to what the
    // XML/GeoJSON readers get from parsing the same value as text.
    def coord(offset: Long, raw: Long): Double =
      java.math.BigDecimal.valueOf(offset + granularity * raw)
        .movePointLeft(9).doubleValue

    val nodes = Seq.newBuilder[(Long, Double, Double)]
    val ways = Seq.newBuilder[RawWay]
    groups.result().foreach { g =>
      val gr = new Reader(g)
      while (gr.hasNext) gr.next() match {
        case (1, WireBytes) => // plain Node
          val nr = new Reader(gr.bytes())
          var (id, lat, lon) = (0L, 0L, 0L)
          while (nr.hasNext) nr.next() match {
            case (1, WireVarint) => id = zigzag(nr.varint())
            case (8, WireVarint) => lat = zigzag(nr.varint())
            case (9, WireVarint) => lon = zigzag(nr.varint())
            case other => nr.skip(other._2)
          }
          nodes += ((id, coord(lonOffset, lon), coord(latOffset, lat)))
        case (2, WireBytes) => // DenseNodes: delta-coded parallel arrays
          val dr = new Reader(gr.bytes())
          var ids, lats, lons = Array.empty[Long]
          while (dr.hasNext) dr.next() match {
            case (1, WireBytes) => ids = dr.packedVarints().map(zigzag)
            case (8, WireBytes) => lats = dr.packedVarints().map(zigzag)
            case (9, WireBytes) => lons = dr.packedVarints().map(zigzag)
            case other => dr.skip(other._2)
          }
          var (id, la, lo) = (0L, 0L, 0L)
          var i = 0
          while (i < ids.length) {
            id += ids(i); la += lats(i); lo += lons(i)
            nodes += ((id, coord(lonOffset, lo), coord(latOffset, la)))
            i += 1
          }
        case (3, WireBytes) => // Way
          val wr = new Reader(gr.bytes())
          var id = 0L
          var keys, vals = Array.empty[Long]
          var refs = Array.empty[Long]
          while (wr.hasNext) wr.next() match {
            case (1, WireVarint) => id = wr.varint()
            case (2, WireBytes) => keys = wr.packedVarints()
            case (3, WireBytes) => vals = wr.packedVarints()
            case (8, WireBytes) =>
              val deltas = wr.packedVarints().map(zigzag)
              refs = deltas.scanLeft(0L)(_ + _).drop(1)
            case other => wr.skip(other._2)
          }
          val tags = keys.zip(vals).flatMap { case (k, v) =>
            if (k < table.length && v < table.length && table(k.toInt).nonEmpty)
              Some(table(k.toInt) -> table(v.toInt))
            else None
          }.toMap
          ways += RawWay(id, refs, tags)
        case other => gr.skip(other._2)
      }
    }
    (nodes.result(), ways.result())
  }

  // ---------------------------------------------------------------------
  // minimal protobuf wire reader
  // ---------------------------------------------------------------------

  private[ingest] val WireVarint = 0
  private[ingest] val WireFixed64 = 1
  private[ingest] val WireBytes = 2
  private[ingest] val WireFixed32 = 5

  private[ingest] def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  /** Sequential reader over one message's bytes: `next()` yields
    * (fieldNumber, wireType); then call the matching consumer (or
    * `skip`).
    */
  private[ingest] final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < buf.length

    def next(): (Int, Int) = {
      val key = varint()
      ((key >>> 3).toInt, (key & 7).toInt)
    }

    def varint(): Long = {
      var result = 0L
      var shift = 0
      var b = 0L
      do {
        require(pos < buf.length, "truncated varint")
        b = buf(pos) & 0xffL
        result |= (b & 0x7f) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      result
    }

    def bytes(): Array[Byte] = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= buf.length, "truncated bytes field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    def packedVarints(): Array[Long] = {
      val body = bytes()
      val r = new Reader(body)
      val out = Array.newBuilder[Long]
      while (r.hasNext) out += r.varint()
      out.result()
    }

    def skip(wireType: Int): Unit = wireType match {
      case WireVarint => varint()
      case WireFixed64 => pos += 8
      case WireBytes => val len = varint().toInt; pos += len
      case WireFixed32 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }
}
