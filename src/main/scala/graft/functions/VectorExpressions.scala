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

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def bitAndCount(a: Column, b: Column): Column =
    ColumnBridge.column(BitAndCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
