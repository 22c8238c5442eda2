package graft.store

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Minimal SQLite 3 database-file codec — writer and reader for table
  * b-trees — implemented byte-level against the published file format
  * (https://www.sqlite.org/fileformat2.html). No JDBC driver ships in this
  * environment, and the GeoPackage interop boundary (the reference's whole
  * persistence format, `geopackage/__init__.py:90-192`) is a real SQLite
  * file — so the minimal subset a .gpkg needs is implemented directly:
  *
  *  - table b-trees (leaf 0x0D / interior 0x05) with overflow-page chains
  *  - the record format (serial types 0-9, TEXT, BLOB; UTF-8 text)
  *  - `sqlite_master` rooted at page 1, INTEGER-PRIMARY-KEY rowid aliasing
  *
  * Not implemented (not needed to write or read a fresh .gpkg): indices
  * (readers ignore missing ones), freelists (fresh files have none), WAL,
  * non-UTF8 encodings, auto-vacuum. The reader rejects files using them
  * where that could change results (encoding), and ignores index b-trees.
  *
  * Values map Scala-side as: null, Long (any SQLite integer width), Double,
  * String, Array[Byte]. Booleans are written as 0/1 integers, mirroring
  * SQLite's own type system.
  */
object SqliteFile {

  val PageSize = 4096
  /** Hard ceiling on a written database file: write() buffers every page in
    * driver memory, so a runaway export must fail fast, not OOM. Override
    * via -Dgraft.gpkg.maxWriteBytes for a deliberate big single-file export
    * (read per write() call, so a long-lived session can change it).
    */
  val DefaultMaxWriteBytes: Long = 2L << 30
  private def maxWriteBytes: Long =
    sys.props.get("graft.gpkg.maxWriteBytes").map(_.toLong)
      .getOrElse(DefaultMaxWriteBytes)
  private val Usable = PageSize // reserved-per-page = 0
  // leaf-table payload spill thresholds (fileformat2.html §B-tree Pages)
  private val MaxLeafLocal = Usable - 35
  private val MinLeafLocal = (Usable - 12) * 32 / 255 - 23

  /** One table to be written: `sql` is the CREATE TABLE text stored in
    * sqlite_master. An INTEGER PRIMARY KEY column is detected from the DDL
    * (same rule real SQLite applies, inline or table-constraint form) and
    * becomes the rowid alias: stored as NULL in records, its value carried
    * by the rowid — deriving it from the DDL keeps writer and reader
    * symmetric by construction.
    */
  final case class TableDef(name: String, sql: String, nCols: Int,
      rows: Iterator[Seq[Any]]) {
    val rowidAlias: Option[Int] = parseCreateTable(sql)._2
  }

  // ================================ write ================================

  def write(path: String, tables: Seq[TableDef],
      applicationId: Int = 0, userVersion: Int = 0): Unit = {
    // UNIQUE constraints and non-INTEGER PRIMARY KEYs make SQLite expect an
    // automatic index b-tree (sqlite_autoindex_*) this writer does not
    // build; a schema declaring one without its index reads as corruption
    // ("database disk image is malformed"), so reject the DDL up front
    tables.foreach { t =>
      val upper = t.sql.toUpperCase
      require(!upper.contains("UNIQUE"),
        s"${t.name}: UNIQUE constraints require autoindex b-trees this writer does not emit")
      require(!upper.contains("PRIMARY KEY") || t.rowidAlias.nonEmpty,
        s"${t.name}: non-INTEGER PRIMARY KEY requires an autoindex b-tree this writer does not emit")
    }
    val pages = ArrayBuffer[Array[Byte]]()
    pages += new Array[Byte](PageSize) // page 1 placeholder (master root)

    // the whole file is assembled in driver memory before the single write
    // — correct for the interop artifact this is (hand a graph to QGIS),
    // wrong for bulk export. Fail fast with a pointer at the distributed
    // path instead of OOMing the driver halfway through.
    val maxBytes = maxWriteBytes
    val maxPages = maxBytes / PageSize
    def allocate(): Int = {
      require(pages.length < maxPages,
        s"SqliteFile.write buffers the whole database in driver memory and " +
          s"is capped at $maxBytes bytes (${maxPages} pages); this " +
          "export exceeds it. Use the distributed `export-gpkg-parquet` " +
          "path for bulk data, or raise -Dgraft.gpkg.maxWriteBytes.")
      pages += new Array[Byte](PageSize); pages.length
    }

    // ---- per-table b-trees (pages 2..), master last so rootpages are known
    val rootPages = tables.map { t =>
      val cells = ArrayBuffer[(Long, Array[Byte])]()
      var autoRowid = 0L
      t.rows.foreach { values =>
        require(values.length == t.nCols,
          s"${t.name}: row has ${values.length} values, table has ${t.nCols} columns")
        val rowid = t.rowidAlias match {
          case Some(i) => values(i) match {
            case l: Long => l
            case i2: Int => i2.toLong
            case other => throw new IllegalArgumentException(
              s"${t.name}: INTEGER PRIMARY KEY value must be integral, got $other")
          }
          case None => autoRowid += 1; autoRowid
        }
        val recValues = t.rowidAlias match {
          case Some(i) => values.updated(i, null)
          case None => values
        }
        cells += ((rowid, encodeRecord(recValues)))
      }
      val sorted = cells.sortBy(_._1).toSeq
      // real SQLite treats duplicate rowids in one b-tree as a malformed
      // database; ingest-generated fids are unique but caller-supplied
      // frames may not be — fail loudly rather than write corruption
      sorted.iterator.sliding(2).withPartial(false).foreach { pair =>
        require(pair(0)._1 != pair(1)._1,
          s"${t.name}: duplicate INTEGER PRIMARY KEY (fid/rowid) value ${pair(0)._1}; " +
            "rowids in an SQLite table b-tree must be unique")
      }
      t.name -> buildTableBtree(sorted, pages, allocate, rootAtPage1 = false)
    }.toMap

    // ---- sqlite_master: (type, name, tbl_name, rootpage, sql) at page 1
    val masterCells = tables.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong,
        encodeRecord(Seq("table", t.name, t.name, rootPages(t.name).toLong, t.sql)))
    }
    buildTableBtree(masterCells, pages, allocate, rootAtPage1 = true)

    // ---- 100-byte file header on page 1
    val h = ByteBuffer.wrap(pages(0)).order(ByteOrder.BIG_ENDIAN)
    h.put("SQLite format 3".getBytes("UTF-8")).put(0.toByte)
    h.putShort(PageSize.toShort) // 16
    h.put(1.toByte).put(1.toByte) // legacy journal read/write versions
    h.put(0.toByte) // reserved space per page
    h.put(64.toByte).put(32.toByte).put(32.toByte)
    h.putInt(1) // file change counter
    h.putInt(pages.length) // database size in pages
    h.putInt(0).putInt(0) // freelist trunk / count
    h.putInt(1) // schema cookie
    h.putInt(4) // schema format (4 = current; enables serial types 8/9)
    h.putInt(0) // default page cache size
    h.putInt(0) // largest root b-tree page (no vacuum)
    h.putInt(1) // text encoding = UTF-8
    h.putInt(userVersion)
    h.putInt(0) // incremental vacuum
    h.putInt(applicationId)
    h.position(92)
    h.putInt(1) // version-valid-for
    h.putInt(3045000) // sqlite version number the format targets

    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)))
    try pages.foreach(out.write) finally out.close()
  }

  /** Pack (rowid, record) cells into a table b-tree; returns the root page
    * number. With `rootAtPage1` the root is forced onto page 1 (the
    * sqlite_master contract), whose content area starts after the 100-byte
    * file header.
    */
  private def buildTableBtree(cells: Seq[(Long, Array[Byte])],
      pages: ArrayBuffer[Array[Byte]], allocate: () => Int,
      rootAtPage1: Boolean): Int = {

    // encode one leaf cell, spilling past-threshold payloads to overflow pages
    def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val p = payload.length
      if (p <= MaxLeafLocal) {
        val b = ArrayBuffer[Byte]()
        b ++= varint(p.toLong); b ++= varint(rowid); b ++= payload
        b.toArray
      } else {
        val k = MinLeafLocal + (p - MinLeafLocal) % (Usable - 4)
        val local = if (k <= MaxLeafLocal) k else MinLeafLocal
        // chain of overflow pages, each: 4-byte next-page BE + data
        var off = local
        val chunks = ArrayBuffer[Array[Byte]]()
        while (off < p) {
          val n = math.min(Usable - 4, p - off)
          chunks += java.util.Arrays.copyOfRange(payload, off, off + n)
          off += n
        }
        val pageNos = chunks.map(_ => allocate())
        pageNos.zipWithIndex.foreach { case (pg, i) =>
          val buf = ByteBuffer.wrap(pages(pg - 1)).order(ByteOrder.BIG_ENDIAN)
          buf.putInt(if (i + 1 < pageNos.length) pageNos(i + 1) else 0)
          buf.put(chunks(i))
        }
        val b = ArrayBuffer[Byte]()
        b ++= varint(p.toLong); b ++= varint(rowid)
        b ++= java.util.Arrays.copyOfRange(payload, 0, local)
        b ++= be32(pageNos.head)
        b.toArray
      }
    }

    // write a b-tree page in place: header + pointer array up front,
    // cell content packed against the page end
    def writePage(pageNo: Int, pageType: Int, cellBytes: Seq[Array[Byte]],
        rightChild: Int): Unit = {
      val base = if (pageNo == 1) 100 else 0
      val page = pages(pageNo - 1)
      val headerSize = if (pageType == 0x05) 12 else 8
      val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
      buf.position(base)
      buf.put(pageType.toByte)
      buf.putShort(0) // first freeblock
      buf.putShort(cellBytes.length.toShort)
      var contentStart = PageSize
      cellBytes.foreach(c => contentStart -= c.length)
      buf.putShort(if (contentStart == 65536) 0 else contentStart.toShort)
      buf.put(0.toByte) // fragmented free bytes
      if (pageType == 0x05) buf.putInt(rightChild)
      var off = contentStart
      val ptr = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
      ptr.position(base + headerSize)
      cellBytes.foreach { c =>
        ptr.putShort(off.toShort)
        System.arraycopy(c, 0, page, off, c.length)
        off += c.length
      }
    }

    def capacity(pageNo: Int, interior: Boolean): Int =
      Usable - (if (pageNo == 1) 100 else 0) - (if (interior) 12 else 8)

    // ---- leaves: greedy fill in rowid order
    val encoded = cells.map { case (rowid, payload) => (rowid, leafCell(rowid, payload)) }
    val singleLeafSize = encoded.iterator.map(_._2.length + 2).sum
    if (rootAtPage1 && singleLeafSize <= capacity(1, interior = false)) {
      writePage(1, 0x0D, encoded.map(_._2), 0)
      return 1
    }
    if (!rootAtPage1 && singleLeafSize <= capacity(2, interior = false)) {
      val pg = allocate()
      writePage(pg, 0x0D, encoded.map(_._2), 0)
      return pg
    }
    var leaves = ArrayBuffer[(Int, Long)]() // (page, max rowid)
    var cur = ArrayBuffer[Array[Byte]]()
    var curBytes = 0
    var curMaxRowid = 0L
    def flushLeaf(): Unit = if (cur.nonEmpty) {
      val pg = allocate()
      writePage(pg, 0x0D, cur.toSeq, 0)
      leaves += ((pg, curMaxRowid))
      cur = ArrayBuffer[Array[Byte]](); curBytes = 0
    }
    encoded.foreach { case (rowid, cell) =>
      if (curBytes + cell.length + 2 > capacity(2, interior = false)) flushLeaf()
      cur += cell; curBytes += cell.length + 2; curMaxRowid = rowid
    }
    flushLeaf()
    if (leaves.isEmpty) { // zero-row table: root is an empty leaf
      if (rootAtPage1) { writePage(1, 0x0D, Nil, 0); return 1 }
      val pg = allocate(); writePage(pg, 0x0D, Nil, 0); return pg
    }

    // ---- interior levels, bottom-up, until one root remains
    var level = leaves
    while (level.length > 1) {
      val next = ArrayBuffer[(Int, Long)]()
      var children = ArrayBuffer[(Int, Long)]()
      var bytes = 0
      def flushInterior(last: Boolean): Unit = if (children.nonEmpty) {
        val cellsI = children.init.map { case (pg, maxR) => be32(pg) ++ varint(maxR) }
        val (rightPg, maxR) = children.last
        val isRoot = last && next.isEmpty && children.length == level.length
        val pg = if (rootAtPage1 && isRoot &&
          cellsI.map(_.length + 2).sum <= capacity(1, interior = true)) 1
        else allocate()
        writePage(pg, 0x05, cellsI.toSeq, rightPg)
        next += ((pg, maxR))
        children = ArrayBuffer[(Int, Long)](); bytes = 0
      }
      level.foreach { case (pg, maxR) =>
        val cellLen = 4 + varint(maxR).length + 2
        if (bytes + cellLen > capacity(2, interior = true)) flushInterior(last = false)
        children += ((pg, maxR)); bytes += cellLen
      }
      flushInterior(last = true)
      level = next
    }
    val root = level.head._1
    if (rootAtPage1 && root != 1) {
      // root landed on an allocated page but page 1 must host it: re-point
      // by writing a one-child interior on page 1
      writePage(1, 0x05, Nil, root)
      1
    } else root
  }

  // =============================== records ===============================

  private[graft] def encodeRecord(values: Seq[Any]): Array[Byte] = {
    val types = ArrayBuffer[Long]()
    val bodies = ArrayBuffer[Array[Byte]]()
    values.foreach {
      case null => types += 0L; bodies += Array.emptyByteArray
      case b: Boolean => types += (if (b) 9L else 8L); bodies += Array.emptyByteArray
      case l0: Int => appendInt(l0.toLong, types, bodies)
      case l0: Long => appendInt(l0, types, bodies)
      case d: Double =>
        types += 7L
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
          .putDouble(d).array()
      case f: Float => // stored as REAL like SQLite itself would
        types += 7L
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
          .putDouble(f.toDouble).array()
      case s: String =>
        val b = s.getBytes("UTF-8")
        types += (13L + 2L * b.length); bodies += b
      case a: Array[Byte] =>
        types += (12L + 2L * a.length); bodies += a
      case other => throw new IllegalArgumentException(
        s"unsupported SQLite value type: ${other.getClass}")
    }
    val typeBytes = types.map(varint)
    // header size varint is part of the header it measures — iterate to the
    // fixpoint (converges in ≤2 steps: lengths only grow at power-of-128
    // boundaries)
    val typesLen = typeBytes.map(_.length).sum
    var headerLen = typesLen + 1
    while (varint(headerLen.toLong).length + typesLen != headerLen)
      headerLen = varint(headerLen.toLong).length + typesLen
    val out = ArrayBuffer[Byte]()
    out ++= varint(headerLen.toLong)
    typeBytes.foreach(out ++= _)
    bodies.foreach(out ++= _)
    out.toArray
  }

  private def appendInt(l: Long, types: ArrayBuffer[Long],
      bodies: ArrayBuffer[Array[Byte]]): Unit = {
    if (l == 0L) { types += 8L; bodies += Array.emptyByteArray }
    else if (l == 1L) { types += 9L; bodies += Array.emptyByteArray }
    else {
      val (t, n) =
        if (l >= Byte.MinValue && l <= Byte.MaxValue) (1L, 1)
        else if (l >= Short.MinValue && l <= Short.MaxValue) (2L, 2)
        else if (l >= -(1L << 23) && l < (1L << 23)) (3L, 3)
        else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, 4)
        else if (l >= -(1L << 47) && l < (1L << 47)) (5L, 6)
        else (6L, 8)
      types += t
      val b = new Array[Byte](n)
      var i = n - 1; var v = l
      while (i >= 0) { b(i) = (v & 0xFF).toByte; v >>= 8; i -= 1 }
      bodies += b
    }
  }

  private[graft] def varint(v: Long): Array[Byte] = {
    if (v < 0 || v >= (1L << 56)) { // 9-byte form: 8 groups of 7 + full low byte
      val b = new Array[Byte](9)
      var x = v
      b(8) = (x & 0xFF).toByte; x >>>= 8
      var i = 7
      while (i >= 0) { b(i) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; i -= 1 }
      return b
    }
    val groups = ArrayBuffer[Byte]()
    var x = v
    do { groups += (x & 0x7F).toByte; x >>>= 7 } while (x != 0)
    val out = groups.reverse.toArray
    var i = 0
    while (i < out.length - 1) { out(i) = (out(i) | 0x80).toByte; i += 1 }
    out
  }

  private def be32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v).array()

  // ================================ read =================================

  final case class Column(name: String, declType: String)
  final case class Table(name: String, sql: String, columns: Seq[Column],
      rowidAlias: Option[Int], rows: Vector[Array[Any]])

  final class Db(val tables: Map[String, Table], val applicationId: Int,
      val userVersion: Int)

  def read(path: String): Db = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 100 &&
      new String(bytes, 0, 15, "UTF-8") == "SQLite format 3",
      s"$path: not an SQLite 3 database")
    val hdr = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val rawPageSize = hdr.getShort(16) & 0xFFFF
    val pageSize = if (rawPageSize == 1) 65536 else rawPageSize
    val reserved = bytes(20) & 0xFF
    val usable = pageSize - reserved
    val encoding = hdr.getInt(56)
    require(encoding == 1, s"$path: only UTF-8 text encoding supported, got $encoding")
    val appId = hdr.getInt(68)
    val userVer = hdr.getInt(60)

    def page(no: Int): ByteBuffer = {
      val b = ByteBuffer.wrap(bytes, (no - 1) * pageSize, pageSize).slice()
      b.order(ByteOrder.BIG_ENDIAN)
      b
    }

    def readVarint(b: ByteBuffer): Long = {
      var v = 0L; var i = 0
      while (i < 8) {
        val x = b.get() & 0xFF
        v = (v << 7) | (x & 0x7F)
        if ((x & 0x80) == 0) return v
        i += 1
      }
      (v << 8) | (b.get() & 0xFF)
    }

    val maxLocal = usable - 35
    val minLocal = (usable - 12) * 32 / 255 - 23

    def payloadOf(b: ByteBuffer, total: Int): Array[Byte] = {
      val local =
        if (total <= maxLocal) total
        else {
          val k = minLocal + (total - minLocal) % (usable - 4)
          if (k <= maxLocal) k else minLocal
        }
      val out = new Array[Byte](total)
      b.get(out, 0, local)
      var off = local
      if (off < total) {
        var next = b.getInt()
        while (next != 0 && off < total) {
          val op = page(next)
          next = op.getInt()
          val n = math.min(usable - 4, total - off)
          op.get(out, off, n)
          off += n
        }
        require(off == total, "truncated overflow chain")
      }
      out
    }

    // walk a table b-tree, yielding (rowid, payload)
    def walk(pageNo: Int, emit: (Long, Array[Byte]) => Unit): Unit = {
      val base = if (pageNo == 1) 100 else 0
      val p = page(pageNo)
      val pageType = p.get(base) & 0xFF
      val nCells = p.getShort(base + 3) & 0xFFFF
      pageType match {
        case 0x05 =>
          val rightChild = p.getInt(base + 8)
          var i = 0
          while (i < nCells) {
            val cellOff = p.getShort(base + 12 + 2 * i) & 0xFFFF
            walk(p.getInt(cellOff), emit)
            i += 1
          }
          walk(rightChild, emit)
        case 0x0D =>
          var i = 0
          while (i < nCells) {
            val cellOff = p.getShort(base + 8 + 2 * i) & 0xFFFF
            val c = page(pageNo)
            c.position(cellOff)
            val payloadLen = readVarint(c).toInt
            val rowid = readVarint(c)
            emit(rowid, payloadOf(c, payloadLen))
            i += 1
          }
        case 0x02 | 0x0A => // index b-tree: not used for table data
        case t => throw new IllegalArgumentException(
          s"unsupported b-tree page type 0x${t.toHexString} on page $pageNo")
      }
    }

    def decodeRecord(payload: Array[Byte]): Array[Any] = {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      val headerLen = readVarint(b).toInt
      val types = ArrayBuffer[Long]()
      while (b.position() < headerLen) types += readVarint(b)
      types.map { t =>
        (t: @unchecked) match {
          case 0 => null
          case 1 => b.get().toLong
          case 2 => b.getShort().toLong
          case 3 =>
            val x: Long = ((b.get() & 0xFFL) << 16) | ((b.get() & 0xFFL) << 8) | (b.get() & 0xFFL)
            (x << 40) >> 40 // sign-extend 24-bit
          case 4 => b.getInt().toLong
          case 5 =>
            var x = 0L
            (0 until 6).foreach(_ => x = (x << 8) | (b.get() & 0xFF))
            (x << 16) >> 16
          case 6 => b.getLong()
          case 7 => b.getDouble()
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new Array[Byte](len); b.get(s); new String(s, "UTF-8")
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val blob = new Array[Byte](len); b.get(blob); blob
        }
      }.toArray
    }

    // ---- sqlite_master → user tables
    val master = ArrayBuffer[(String, String, String, Long, String)]()
    walk(1, (_, payload) => {
      val r = decodeRecord(payload)
      if (r.length >= 5 && r(0) == "table")
        master += ((r(0).asInstanceOf[String], r(1).asInstanceOf[String],
          r(2).asInstanceOf[String], r(3).asInstanceOf[Long],
          r(4).asInstanceOf[String]))
    })

    // virtual tables (e.g. the rtree spatial indexes GDAL/QGIS and the
    // reference's add_rtree step write) carry rootpage=0 and no storable
    // rows of their own — their data lives in the rtree_*_node/parent/rowid
    // shadow tables, which are ordinary b-trees read below. Walking page 0
    // would wrap the buffer at a negative offset.
    val tables = master.filter { case (_, _, _, rootpage, sql) =>
      rootpage > 0 && !sql.toUpperCase.startsWith("CREATE VIRTUAL")
    }.map { case (_, name, _, rootpage, sql) =>
      val (cols, rowidAlias) = parseCreateTable(sql)
      val rows = Vector.newBuilder[Array[Any]]
      walk(rootpage.toInt, (rowid, payload) => {
        val r = decodeRecord(payload)
        // records may be shorter than the declared column list (rows written
        // before an ALTER TABLE ADD COLUMN); missing trailing values are NULL
        val full = if (r.length >= cols.length) r
          else r ++ Array.fill[Any](cols.length - r.length)(null)
        rowidAlias.foreach(i => full(i) = rowid)
        rows += full
      })
      name -> Table(name, sql, cols, rowidAlias, rows.result())
    }.toMap

    new Db(tables, appId, userVer)
  }

  /** Column names/types and the INTEGER-PRIMARY-KEY rowid alias out of a
    * CREATE TABLE statement — both inline (`fid INTEGER PRIMARY KEY`) and
    * table-constraint (`fid INTEGER, ..., PRIMARY KEY (fid)`) forms, the
    * latter being what the reference's DDL uses
    * (`feature_table.py:91-99`).
    */
  private[graft] def parseCreateTable(sql: String): (Seq[Column], Option[Int]) = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open >= 0 && close > open, s"cannot parse DDL: $sql")
    val body = sql.substring(open + 1, close)
    // split top-level commas (types like DECIMAL(10,2) nest parens)
    val parts = ArrayBuffer[String]()
    var depth = 0; var start = 0
    body.zipWithIndex.foreach { case (c, i) =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { parts += body.substring(start, i); start = i + 1 }
    }
    parts += body.substring(start)
    val cols = ArrayBuffer[Column]()
    var rowidAlias: Option[Int] = None
    var pkConstraintCol: Option[String] = None
    val constraintStart = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.map(_.trim).filter(_.nonEmpty).foreach { part =>
      val upper = part.toUpperCase
      val firstTok = upper.takeWhile(!_.isWhitespace)
      if (constraintStart.contains(firstTok)) {
        if (firstTok == "PRIMARY") {
          val o = part.indexOf('('); val c2 = part.lastIndexOf(')')
          if (o >= 0 && c2 > o)
            pkConstraintCol = Some(unquote(part.substring(o + 1, c2).trim))
        }
      } else {
        val name = unquote(part.takeWhile(c => !c.isWhitespace))
        val rest = part.drop(part.takeWhile(c => !c.isWhitespace).length).trim
        cols += Column(name, rest.takeWhile(!_.isWhitespace).toUpperCase)
        if (upper.contains("INTEGER") && upper.contains("PRIMARY KEY"))
          rowidAlias = Some(cols.length - 1)
      }
    }
    pkConstraintCol.foreach { pk =>
      val i = cols.indexWhere(_.name.equalsIgnoreCase(pk))
      if (i >= 0 && cols(i).declType == "INTEGER") rowidAlias = Some(i)
    }
    (cols.toSeq, rowidAlias)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\'') || (t.head == '`' && t.last == '`')))
      t.substring(1, t.length - 1)
    else if (t.length >= 2 && t.head == '[' && t.last == ']')
      t.substring(1, t.length - 1)
    else t
  }
}
