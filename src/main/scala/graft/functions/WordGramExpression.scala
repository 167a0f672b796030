package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_wordgram_hashes(loweredText, n)`: sorted distinct xxhash64
  * (seed 42, the SQL `xxhash64` seed) of every word n-gram of an
  * ALREADY-LOWERCASED string, as primitive longs in one byte pass —
  * no token strings, no gram strings, no interpreted lambdas.
  *
  * Bit-parity contract (spec-pinned): equals
  * `sort_array(array_distinct(transform(<wordGramsSql>, g -> xxhash64(g))))`
  * over the same text. That holds because (a) tokens are maximal runs
  * of `[a-z0-9]` BYTES, and byte-wise splitting equals the SQL
  * char-class split — every non-`[a-z0-9]` character, ASCII or
  * multi-byte, consists solely of bytes outside 0x30-0x39/0x61-0x7a
  * (UTF-8 lead bytes are >= 0xC2, continuations 0x80-0xBF); and
  * (b) each gram is hashed over exactly the bytes of
  * `concat_ws(' ', tokens)` via a reused scratch buffer.
  *
  * The caller passes `lower(text)` (codegen'd built-in), NOT raw text:
  * Unicode lowercasing (İ, the Kelvin sign, etc.) stays the built-in's
  * job, so this kernel's byte-split can never disagree with the
  * tokenizer the string-verify side and the DuckDB oracle use.
  */
case class WordGramHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_wordgram_hashes"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any, nAny: Any): Any =
    new GenericArrayData(WordGramHashes.hashes(text.asInstanceOf[UTF8String], nAny.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordGramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, n) => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.hashes($t, $n));"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordGramHashes {
  private final val Seed = 42L // SQL xxhash64's seed -> parity with xxhash64(gramString)

  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Sorted distinct xxhash64 of every n-token word gram. */
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val len = text.numBytes()
    val bytes = text.getBytes // materialize once; token slices copy from here
    // token boundaries
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
    while (i < len) {
      if (isTokenByte(bytes(i))) {
        val s = i
        while (i < len && isTokenByte(bytes(i))) i += 1
        if (t == starts.length) {
          starts = java.util.Arrays.copyOf(starts, t * 2)
          ends = java.util.Arrays.copyOf(ends, t * 2)
        }
        starts(t) = s; ends(t) = i; t += 1
      } else i += 1
    }
    if (t < n) return Array.emptyLongArray
    val count = t - n + 1
    val raw = new Array[Long](count)
    var scratch = new Array[Byte](64)
    var g = 0
    while (g < count) {
      var need = n - 1 // separator spaces
      var k = g
      while (k < g + n) { need += ends(k) - starts(k); k += 1 }
      if (scratch.length < need) scratch = new Array[Byte](Integer.highestOneBit(need) * 2)
      var w = 0
      k = g
      while (k < g + n) {
        if (k > g) { scratch(w) = ' '; w += 1 }
        val tl = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), scratch, w, tl)
        w += tl
        k += 1
      }
      raw(g) = XXH64.hashUnsafeBytes(scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, w, Seed)
      g += 1
    }
    java.util.Arrays.sort(raw)
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == count) raw else java.util.Arrays.copyOf(raw, w)
  }
}
