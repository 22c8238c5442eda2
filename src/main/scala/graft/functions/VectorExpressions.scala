package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding hot path: a primitive-loop
  * dot product that stays inside whole-stage codegen (the
  * `zip_with`+`aggregate` composition allocates per-row arrays and falls
  * back to interpreted lambda evaluation — ~10× slower on a 2M-pair
  * similarity join).
  *
  * Summation is an ascending-index fold, bit-identical to the higher-order
  * function form, so oracle parity is unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double>; build via DotProduct.coerced (or
  // the VectorFunctions.dot wrapper) so any numeric array input — e.g. the
  // array<float> embeddings column from SQL — gets an element-wise cast
  // instead of getDouble reading float-packed data
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Popcount of the bitwise AND of two long-array bitmasks — set
  * intersection cardinality when sets are dictionary-encoded as bitsets.
  * Powers exact pairwise Jaccard on small vocabularies at ~100× the speed
  * of an exploded inverted-index join.
  */
case class BitAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // see DotProduct: build via BitAndCount.coerced from SQL
  override def dataType: DataType = LongType
  override def prettyName: String = "bit_and_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitAndCount =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Builder for the SQL surface: casts both inputs to array<double> (a
    * no-op cast when already canonical, removed by SimplifyCasts).
    */
  def coerced(a: Expression, b: Expression): DotProduct =
    DotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
}

object BitAndCount {
  def coerced(a: Expression, b: Expression): BitAndCount =
    BitAndCount(Cast(a, ArrayType(LongType)), Cast(b, ArrayType(LongType)))
}

/** Static kernel behind [[MinHashSig]] — plain object so the generated
  * code can call the static forwarder directly. Coefficient arrays are
  * cached per numHashes (the UDF form re-derived 128 longs per row).
  */
object MinHashKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  /** The ONE minhash loop — [[graft.llm.Dedup.minhashSignatureScala]]
    * delegates here, so the expression and the oracle builder cannot
    * drift. Null text hashes like empty text (no shingles → the
    * all-Long.MaxValue signature), matching the SQL oracle's coalesce.
    */
  def computeRaw(text: String, numHashes: Int, shingleN: Int): Array[Long] = {
    val (as, bs) = cache.computeIfAbsent(numHashes,
      nh => graft.llm.Dedup.hashCoeffs(nh))
    val p = 4294967311L // smallest prime > 2^32
    val mins = Array.fill(numHashes)(Long.MaxValue)
    graft.llm.Dedup.shinglesScala(text, shingleN).foreach { s =>
      // a < 2^29 and x < 2^32 keep x*a+b < 2^61: no 64-bit overflow
      val x = Hashing.mixHash(s) & 0xFFFFFFFFL
      var i = 0
      while (i < numHashes) {
        val h = (x * as(i) + bs(i)) % p
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    mins
  }

  def compute(text: String, numHashes: Int, shingleN: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      computeRaw(text, numHashes, shingleN))
}

/** Java-style wraparound polynomial string hash as a native expression —
  * the LSH band-bucket key ([[Hashing.polyHash]]). Null-propagating.
  */
case class PolyHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    Hashing.polyHash(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.polyHash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** splitmix64 finalizer as a native expression ([[Hashing.splitmix64]]):
  * the engine's public deterministic stream, usable inside higher-order
  * functions under ANSI mode (the JVM arithmetic wraps; inline SQL longs
  * would overflow-throw). Null-propagating.
  */
case class SplitMix64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override protected def nullSafeEval(input: Any): Any =
    Hashing.splitmix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.splitmix64($c);")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

/** MinHash signature as a native Catalyst expression: stays inside
  * whole-stage codegen (no UDF plan break, no ScalaUDF boxing/encoder
  * round trip). Bit-identical to [[graft.llm.Dedup.minhashSignatureScala]]
  * — same shingle set, same affine hash family.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // null text hashes like empty text (the UDF predecessor's behavior and
  // the SQL oracle's coalesce(..., [])): the signature is never null
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    MinHashKernel.compute(if (v == null) "" else v.toString, numHashes, shingleN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = s"graft.functions.MinHashKernel.compute(" +
      s"${c.isNull} ? \"\" : ${c.value}.toString(), $numHashes, $shingleN)"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Static kernels behind the ANN expressions — plain object so generated
  * code calls the static forwarders; the centroid/codebook/table state is a
  * small driver-built array embedded as a codegen reference object (the
  * same state the former ScalaUDFs closed over, without the UDF plan break
  * and boxing round-trip). Arithmetic is bit-identical to the UDFs: first
  * maximum kept on cosine ties, strict `<` argmin for PQ codes, ascending-
  * index folds throughout.
  */
object AnnKernel {
  /** Index of the centroid with the highest cosine similarity (ties →
    * lowest index, matching Scala maxBy).
    */
  def nearestCos(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var idx = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = v.numElements()
      while (i < n) {
        val x = v.getDouble(i); val y = cent(i)
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = d / java.lang.Math.sqrt(na * nb)
      if (s > best) { best = s; idx = c }
      c += 1
    }
    idx
  }

  private def l2(v: ArrayData, off: Int, b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < b.length) { val t = v.getDouble(off + i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Product-quantization codes: per-subspace argmin L2 to the codebook
    * (strict `<`: ties keep the lowest centroid id).
    */
  def pqEncode(v: ArrayData, codebook: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebook.length
    val subDim = codebook(0)(0).length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebook(j)
      var bestC = 0
      var bestD = l2(v, j * subDim, cb(0))
      var c = 1
      while (c < cb.length) {
        val d = l2(v, j * subDim, cb(c))
        if (d < bestD) { bestC = c; bestD = d }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Asymmetric-distance sum over the query's lookup table, ascending j. */
  def pqAdist(codes: ArrayData, table: Array[Array[Double]]): Double = {
    var s = 0.0; var j = 0
    while (j < table.length) { s += table(j)(codes.getInt(j)); j += 1 }
    s
  }
}

/** IVF centroid assignment as a native expression (was a per-row ScalaUDF:
  * the one non-codegen node in the ann_ivf_topk scan stage).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernel.nearestCos(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AnnKernel.nearestCos($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** PQ encode as a native expression; see [[AnnKernel.pqEncode]]. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernel.pqEncode(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AnnKernel.pqEncode($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ asymmetric-distance lookup as a native expression. */
case class PqAdist(child: Expression, table: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adist"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernel.pqAdist(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("table", table, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AnnKernel.pqAdist($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdist =
    copy(child = newChild)
}

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def bitAndCount(a: Column, b: Column): Column =
    ColumnBridge.column(BitAndCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(v.cast("array<double>")), centroids))

  def pqEncode(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(v.cast("array<double>")), codebook))

  def pqAdist(codes: Column, table: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdist(ColumnBridge.expression(codes), table))
}
