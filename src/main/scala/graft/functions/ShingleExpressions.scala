package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling for the near-duplicate path.
  *
  * `graft_shingle_hashes(text, n)` hashes every character n-gram of the
  * text and returns the SORTED DISTINCT hash array. Downstream set
  * algebra (jaccard, minhash) then runs on primitive longs:
  * - vs `array_distinct(transform(sequence(...), i -> substring(...)))`,
  *   this replaces an interpreted lambda + per-gram string allocation
  *   with one pass over the text's bytes;
  * - sortedness turns pairwise intersection into a linear merge walk
  *   (`graft_jaccard_sorted`) instead of hash-set probes on strings.
  * A 64-bit hash collision inside one pair's union (~600 elements →
  * P ≈ 1e-14) is the accepted trade for primitive set ops.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_shingle_hashes"
  override def inputTypes: Seq[DataType] = Seq(StringType, org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any, nAny: Any): Any =
    new GenericArrayData(ShingleHashes.hashes(text.asInstanceOf[UTF8String], nAny.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, n) => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.hashes($t, $n));"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  private final val Seed = 0x51ed270bL

  /** Sorted distinct xxhash64 of every `n`-codepoint shingle.
    *
    * One decode pass collects the codepoint byte offsets, then each
    * shingle hashes its byte slice directly (the SimHash kernel's
    * idiom). The previous `substringSQL(i + 1, n)` per position
    * re-scanned the string from byte 0 to LOCATE codepoint i — an
    * O(chars²) walk that dominated every minhash/shingle stage on
    * long documents. Hash input bytes are identical (a codepoint
    * window's bytes are the slice [off(i), off(i+n))), so signatures
    * are unchanged bit-for-bit.
    */
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    val chars = text.numChars()
    val off = new Array[Int](chars + 1)
    var bi = 0
    var c = 0
    while (c < chars) {
      off(c) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      c += 1
    }
    off(chars) = bytes.length
    val count = math.max(chars - n + 1, 1)
    val raw = new Array[Long](count)
    var i = 0
    while (i < count) {
      val s0 = off(i)
      val e0 = off(math.min(i + n, chars))
      raw(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s0, e0 - s0, Seed)
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedup of the sorted array
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == count) raw else java.util.Arrays.copyOf(raw, w)
  }
}

/** Exact Jaccard of two SORTED long arrays via a linear merge walk. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_jaccard_sorted"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaccardSorted.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.jaccard($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na.toLong + nb - inter)
  }
}

/** MinHash signature over PRE-HASHED shingles (array<long>): two cheap
  * long-mix hashes per element derive the k functions — no string
  * rehashing at all. Pairs with `graft_shingle_hashes`.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_minhash_hashed"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashFromHashes.signature(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashFromHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.signature($a, $numHashes));"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromHashes {
  private final val Seed1 = 0x9747b28cL
  private final val Seed2 = 0x85ebca6bL

  def signature(hashes: ArrayData, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      val h1 = XXH64.hashLong(h, Seed1)
      val h2 = XXH64.hashLong(h, Seed2)
      var g = h1
      var i = 0
      while (i < k) {
        if (g < out(i)) out(i) = g
        g += h2
        i += 1
      }
      j += 1
    }
    out
  }
}
