package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** LSH band keys from a MinHash signature in one native pass.
  *
  * `graft_lsh_bands(sig, r)` hashes each `r`-wide slice of an
  * `array<long>` signature into one band key — bit-identical to the
  * higher-order-function formulation it replaces,
  * `transform(sequence(0, bands-1), b -> xxhash64(b, slice(sig,
  * b*r+1, r)))`, because it folds the same catalyst XXH64 primitives
  * in the same order (seed 42, hashInt of the band index, then each
  * slice element via hashLong). Band VALUES therefore stay exactly
  * what the composed form produced; every bucket-dependent behavior
  * (maxBucket trimming order, the signature index's stored buckets)
  * is unchanged.
  *
  * Why it exists: `transform` is CodegenFallback, and one fallback
  * expression ejects the WHOLE projection from whole-stage codegen —
  * here that projection also carries the shingle + minhash kernels
  * (`graft_shingle_hashes`, `graft_minhash_hashed`), the CPU-heavy
  * stage of every MinHash query (q12/q13/q40/q55/q57/q58). Same
  * fusion lever as `graft_winnow`/`graft_textcounts`.
  */
case class LshBands(child: Expression, r: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_lsh_bands"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LshBands.bands(input.asInstanceOf[ArrayData], r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LshBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bandArr")
      s"""
         |long[] $b = $cls.bands($a, $r);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($b);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBands {
  /** Shared kernel for interpreted eval and codegen. Same fold as
    * Spark's `xxhash64(intLit, array<long>)`: seed 42, hashInt(band),
    * then hashLong per element with the running hash as seed.
    */
  def bands(sig: ArrayData, r: Int): Array[Long] = {
    val k = sig.numElements()
    val nb = k / r
    val out = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      var h = XXH64.hashInt(b, 42L)
      var j = 0
      while (j < r) { h = XXH64.hashLong(sig.getLong(b * r + j), h); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}
