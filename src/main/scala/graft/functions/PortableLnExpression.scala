package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Portable natural log as a native codegen kernel.
  *
  * The language-model family (perplexity scoring, DSIR weighting)
  * needs a cross-engine bit-exact ln; the SQL macro form
  * (`LanguageModel.portableLnSql`) builds it from IEEE-exact +-* /
  * ops, but macro-expanding it textually repeats the argument
  * expression ~128 times per ln call — the q140 projection grew so
  * large its formatted plan line truncated the plan dump and the
  * Janino-compiled projection dominated the query (r19 verdict
  * finding #1). This is the same function as ONE compiled JVM
  * method: identical operation sequence on identical doubles, so the
  * result is bit-identical to the macro expansion (spec-pinned in
  * LanguageModelSpec by evaluating both over the fixture), and the
  * DuckDB oracle keeps replaying the `duck = true` macro unchanged —
  * hashes cannot move.
  *
  * Scale shape: a single static call inside whole-stage codegen, no
  * allocation, no broadcast — the hot path of scoring a 100 TB crawl
  * is one method call per trigram instead of a kilobyte-scale
  * expression tree per trigram.
  */
object PortableLnKernel {

  /** Bit-exact twin of `LanguageModel.portableLnRef` / the SQL macro:
    *   n = m * 2^e with e = bitlength(n) - 1, m in [1,2)
    *   ln(m) = 2 * artanh((m-1)/(m+1))  (33-term odd Horner series)
    *   ln(n) = ln(m) + e * LN2          (LN2 the double literal)
    * Every step is a correctly-rounded IEEE-754 double op in the same
    * order as the macro, so Spark, DuckDB and this JVM loop agree on
    * every bit.
    */
  def ln(n: Long): Double = {
    require(n >= 1, s"portable ln needs n >= 1, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << e).toDouble
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    var h = 1.0 / 33.0
    var k = 31
    while (k >= 1) { h = h * t2 + 1.0 / k.toDouble; k -= 2 }
    2.0 * t * h + e.toDouble * 0.6931471805599453
  }

  /** The quantized log-ratio the LM family sums: floor((ln(num) -
    * ln(den)) * 1e9) as a BIGINT (nano-nats). Matches Spark's
    * `CAST(floor(d * CAST(1e9 AS DOUBLE)) AS BIGINT)` on the macro
    * output: Spark's Floor on DoubleType is Math.floor(..).toLong.
    */
  def lpNano(num: Long, den: Long): Long =
    Math.floor((ln(num) - ln(den)) * 1000000000.0).toLong
}

/** `graft_pln(n)` — portable ln of a positive BIGINT, bit-identical
  * to the `portableLnSql` macro expansion but one codegen call.
  */
case class PortableLn(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_pln"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PortableLnKernel.ln(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PortableLnKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.ln($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_lp_nano(num, den)` — floor((graft_pln(num) -
  * graft_pln(den)) * 1e9) as BIGINT: the whole per-trigram quantized
  * log-probability (`LanguageModel.lpNanoSql`) as one codegen call.
  */
case class PortableLpNano(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_lp_nano"
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(num: Any, den: Any): Any =
    PortableLnKernel.lpNano(num.asInstanceOf[Long], den.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PortableLnKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.lpNano($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
