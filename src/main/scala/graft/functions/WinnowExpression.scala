package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing (Schleimer–Wilkerson–Aiken / MOSS) fingerprint selection
  * in one native pass.
  *
  * `graft_winnow(tokens, k, w)` builds the word `k`-grams of an
  * `array<string>`, hashes each with the portable first-60-bits-of-md5
  * construction ([[PortableMinHashBands.hash60]] — `conv(substr(md5(g),
  * 1,15),16,10)` in Spark SQL, `('0x'||substr(md5(g),1,15))::BIGINT`
  * in DuckDB), slides a window of `w` consecutive gram hashes, and
  * returns the sorted distinct window minima.
  *
  * Exactly the higher-order-function formulation in
  * `TextAnalysis.winnowSelectPortableSql` — which stays as the
  * documentation/parity form — but HOFs are CodegenFallback
  * (interpreted per row, with the gram strings, hash arrays, and
  * window slices all materialized as boxed intermediates); this is a
  * primitive loop inside whole-stage codegen. Measured ~3x on the
  * fingerprint pass at sf0.1. Parity is spec-pinned bit for bit
  * against the HOF form on the real corpus, and the DuckDB oracle
  * (q73-q76) checks the same construction end to end.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_winnow"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFingerprint.select(input.asInstanceOf[ArrayData], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val sel = ctx.freshName("sel")
      s"""
         |long[] $sel = $cls.select($a, $k, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sel);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Shared kernel for interpreted eval and codegen.
    *
    * Null/EMPTY tokens are dropped in-kernel before gram building:
    * the SQL tokenizer is `filter(split(lower(t), '[^a-z0-9]+'),
    * x -> length(x) > 0)`, but `filter` is a higher-order function —
    * CodegenFallback — and ANY fallback expression in a projection
    * ejects the whole projection from whole-stage codegen. Accepting
    * the raw `split()` output (codegen'd) and compacting here keeps
    * the entire stage fused. The compacted sequence is exactly the
    * filtered token sequence, so results are identical (spec-pinned
    * against the pure-SQL form).
    *
    * The window slide is end-clamped and always emits at least one
    * window when any gram exists, matching the SQL form's
    * `greatest(n - w + 1, 1)`.
    */
  def select(tokens: ArrayData, k: Int, w: Int): Array[Long] = {
    val nRaw = tokens.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](nRaw)
    var m = 0
    var r = 0
    while (r < nRaw) {
      val t = tokens.getUTF8String(r)
      if (t != null && t.numBytes > 0) { toks(m) = t; m += 1 }
      r += 1
    }
    if (m < k) return Array.emptyLongArray
    val nGrams = m - k + 1
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j).toString)
        j += 1
      }
      hs(i) = PortableMinHashBands.hash60(sb.toString.getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    // sliding minima: O(nGrams * w) — w is a small constant (default 4),
    // so the branch-free inner loop beats a deque's bookkeeping
    val nWin = if (nGrams - w + 1 > 1) nGrams - w + 1 else 1
    val mins = new Array[Long](nWin)
    var a = 0
    while (a < nWin) {
      var winMin = Long.MaxValue
      var b = a
      val end = if (a + w < nGrams) a + w else nGrams
      while (b < end) { if (hs(b) < winMin) winMin = hs(b); b += 1 }
      mins(a) = winMin
      a += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    var p = 1
    while (p < nWin) {
      if (mins(p) != mins(p - 1)) { mins(out) = mins(p); out += 1 }
      p += 1
    }
    java.util.Arrays.copyOf(mins, out)
  }
}
