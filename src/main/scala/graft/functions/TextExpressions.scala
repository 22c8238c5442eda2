package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the text-analysis expressions — plain object so
  * generated code calls the static forwarders (same shape as
  * [[MinHashKernel]]/[[AnnKernel]]). The scoring logic is bit-identical to
  * the former ScalaUDFs, so the SQL oracles are unchanged; the win is plan
  * shape: the scan → score stage stays one whole-stage-codegen span with
  * no ScalaUDF boxing/encoder round trip.
  */
object TextKernel {

  /** Marker-word language ID over {en, de, es, fr, zh} — see
    * [[graft.llm.Text.Markers]] (the oracle interpolates the same lists).
    * Null/empty/markerless text → "und".
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(c => c >= 0x4E00 && c <= 0x9FFF).count()
    if (cjk * 2 >= text.length) return "zh"
    val ws = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (ws.isEmpty) return "und"
    val scores = graft.llm.Text.Markers.collect { case (lang, m) if m.nonEmpty =>
      lang -> ws.count(m.contains)
    }
    val (best, score) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (score == 0) "und" else best
  }

  def langIdUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(langId(if (s == null) null else s.toString))

  /** Winnowed rolling fingerprint: minimum wraparound poly hash over word
    * `k`-grams (whole lowercased text when shorter than `k` words).
    */
  def rollingFingerprint(text: String, k: Int): Long = {
    val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (ws.length < k) Hashing.polyHash(ws.mkString(" "))
    else ws.sliding(k).map(g => Hashing.polyHash(g.mkString(" "))).min
  }
}

/** Language ID as a native expression. Never null: null text scores "und",
  * matching the UDF predecessor and the SQL oracle's coalesce.
  */
case class LangId(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    TextKernel.langIdUtf8(
      if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = s"graft.functions.TextKernel.langIdUtf8(" +
      s"${c.isNull} ? null : ${c.value})"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Rolling k-gram fingerprint as a native expression; null-propagating. */
case class RollingFingerprint(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.rollingFingerprint(input.toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernel.rollingFingerprint($c.toString(), $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object TextFunctions {
  def langId(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text.cast("string"))))

  def rollingFingerprint(text: Column, k: Int): Column =
    ColumnBridge.column(RollingFingerprint(
      ColumnBridge.expression(text.cast("string")), k))
}
