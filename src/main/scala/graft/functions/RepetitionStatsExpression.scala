package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition signals in one native pass.
  *
  * `graft_repstats(tokens)` computes, over an `array<string>` token
  * vector, the struct `(n_tokens, n_types, type_token_ratio,
  * dup_trigram_ratio, top_token_ratio)` — the repetition/quality
  * filters of `TextAnalysis.repetitionStats` (reference quality
  * filtering: TransformJob drops degenerate rows the same way;
  * reference: FactJob.scala:21-24 null/range guards).
  *
  * Exactly the higher-order-function formulation that stays in
  * [[graft.text.TextAnalysis.repetitionStats]]'s Scaladoc as the
  * parity/documentation form — but `transform`/`aggregate`/`filter`
  * HOFs are CodegenFallback: the projection is interpreted per row
  * and every intermediate (the distinct-token list, the trigram
  * string list, the fold state struct) materializes boxed. This is a
  * primitive loop inside whole-stage codegen, the same lever that
  * bought the winnowing kernel ~3x ([[WinnowFingerprint]]).
  *
  * One pass interns tokens to dense int ids (a hash map doing triple
  * duty: type count = map size, per-type frequencies for the
  * top-token signal, and id vectors for trigram packing); distinct
  * trigrams are counted by sorting packed 21-bit id triples — no
  * per-trigram string is ever built. Results are BIT-IDENTICAL to
  * the HOF form (spec-pinned on the real corpus): all five signals
  * derive from exact integer counts, and the three ratios apply the
  * same IEEE op order (`(double) count / divisor`).
  *
  * Null or empty tokens are dropped in-kernel, so callers pass the
  * raw (codegen'd) `split(lower(text), '[^a-z0-9]+')` output instead
  * of the CodegenFallback `filter(...)` wrapper — identical token
  * sequence, whole stage stays fused.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_repstats"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = RepetitionStats.Schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("type_token_ratio", DoubleType, nullable = false),
    StructField("dup_trigram_ratio", DoubleType, nullable = false),
    StructField("top_token_ratio", DoubleType, nullable = false)))

  /** Ids are packed three-per-long for trigram dedup: 21 bits each.
    * Documents with more distinct types than this fall back to the
    * string-set path (same counts, just slower) — at 2M+ distinct
    * tokens in ONE document that path has bigger problems than
    * boxing.
    */
  private val MaxPackedTypes = 1 << 21

  /** Shared kernel for interpreted eval and codegen. */
  def stats(tokens: ArrayData): InternalRow = {
    val nRaw = tokens.numElements()
    // intern pass: compact empties, map token -> dense id, count freq
    val idOf = new java.util.HashMap[UTF8String, Integer](Math.min(nRaw * 2, 1 << 16))
    var freq = new Array[Int](Math.min(Math.max(nRaw, 16), 1 << 16))
    val ids = new Array[Int](nRaw)
    var n = 0
    var i = 0
    while (i < nRaw) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes > 0) {
        var id = idOf.get(t)
        if (id == null) {
          id = Integer.valueOf(idOf.size)
          // copy: unsafe-backed UTF8Strings may alias a shared buffer
          idOf.put(t.clone(), id)
          if (id >= freq.length) freq = java.util.Arrays.copyOf(freq, freq.length * 2)
        }
        freq(id) = freq(id) + 1
        ids(n) = id
        n += 1
      }
      i += 1
    }
    val nTypes = idOf.size
    var best = 0
    i = 0
    while (i < nTypes) { if (freq(i) > best) best = freq(i); i += 1 }

    // distinct trigrams: sort packed id triples, count boundaries
    var dTri = 0
    if (n >= 3) {
      if (nTypes < MaxPackedTypes) {
        val tri = new Array[Long](n - 2)
        i = 0
        while (i < n - 2) {
          tri(i) = (ids(i).toLong << 42) | (ids(i + 1).toLong << 21) | ids(i + 2).toLong
          i += 1
        }
        java.util.Arrays.sort(tri)
        dTri = 1
        i = 1
        while (i < tri.length) { if (tri(i) != tri(i - 1)) dTri += 1; i += 1 }
      } else {
        // unpackable (≥2^21 types in one document): exact but boxed
        val set = new java.util.HashSet[String]((n - 2) * 2)
        i = 0
        while (i < n - 2) { set.add(s"${ids(i)} ${ids(i + 1)} ${ids(i + 2)}"); i += 1 }
        dTri = set.size
      }
    }

    // same IEEE op order as the SQL form: (double) int / (double) int
    val ttr = nTypes.toDouble / Math.max(n, 1).toDouble
    val dup = if (n >= 3) 1.0d - dTri.toDouble / (n - 2).toDouble else 0.0d
    val top = if (n > 0) best.toDouble / n.toDouble else 0.0d
    new GenericInternalRow(Array[Any](n.toLong, nTypes.toLong, ttr, dup, top))
  }
}
