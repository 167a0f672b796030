package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash sign-pack over a feature array in one native pass.
  *
  * `graft_simhash(features, bits, mode)` computes the classic SimHash
  * (Charikar random-hyperplane sketch, the Google near-dup detector):
  * hash every feature, accumulate +1/-1 per bit position by the
  * feature hash's bit, and pack the accumulator signs into one long.
  * Two modes cover both formulations in `graft.dedup.Dedup`:
  *  - `md5` (bits=60): feature hash = first 60 bits of md5 — the
  *    oracle-PORTABLE construction (identical value in DuckDB SQL,
  *    parity proven by q12's MinHash), production for q14.
  *  - `xxh` (bits=64): feature hash = Spark-compatible xxhash64(t)
  *    (seed 42, string bytes) — one fewer md5 per feature.
  *
  * Replaces a doubly-nested HOF pipeline (`aggregate` over features x
  * `transform` over 60 bit positions x `zip_with` accumulate): per
  * feature that interpreted form allocates two 60-element boxed
  * arrays and evaluates 180 lambdas; this kernel is a two-level
  * primitive loop on a stack accumulator inside whole-stage codegen.
  * Bit-identical by construction (same feature hash, same sign rule,
  * same `> 0` pack threshold); spec-pinned against the HOF forms.
  */
case class SimHash(child: Expression, bits: Int, md5Mode: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_simhash"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash.pack(input.asInstanceOf[ArrayData], bits, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.pack($a, $bits, $md5Mode);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Portable SimHash straight from TEXT: distinct character `n`-gram
  * shingles, md5-60bit feature hashes, per-bit sums, sign-pack — all
  * one kernel. Exists because the shingle EXPRESSION
  * (`array_distinct(transform(sequence(...), substring))`) is itself
  * a CodegenFallback HOF: `graft_simhash` over it computes natively
  * but the projection still interprets. This variant decodes
  * code-point offsets once and hashes byte slices in place — no gram
  * strings, no intermediate array, whole stage fused. Bit-identical
  * to `graft_simhash(shingleSql(text), bits, true)` (spec-pinned):
  * dedup is on the gram BYTES (= distinct strings), and the clamped
  * substring semantics (one empty gram for empty text, one short
  * gram for text shorter than `n`) are reproduced exactly.
  */
case class SimHashShingled(child: Expression, n: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_simhash_shingled"
  override def inputTypes: Seq[DataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash.packShingled(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.packShingled($a, $n, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {

  /** Shingled-text kernel (see [[SimHashShingled]]). */
  def packShingled(s: org.apache.spark.unsafe.types.UTF8String, n: Int, bits: Int): Long = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    // code-point start offsets, decoded once — gram i is the byte
    // slice [off(i), off(min(i+n, numChars)))
    val off = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (c < numChars) {
      off(c) = i
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    off(numChars) = bytes.length
    val nStarts = Math.max(numChars - n + 1, 1)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](Math.min(nStarts * 2, 1 << 16))
    val sums = new Array[Int](bits)
    var p = 0
    while (p < nStarts) {
      val endChar = Math.min(p + n, numChars)
      val bOff = off(p)
      val bLen = off(endChar) - bOff
      // dedup on gram bytes (== distinct gram strings); the view does
      // not copy the slice
      if (seen.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, bOff, bLen))) {
        val h = PortableMinHashBands.hash60(bytes, bOff, bLen)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      p += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Shared kernel for interpreted eval and codegen. Null features
    * are skipped — the tokenizers feeding this (split(),
    * array_distinct of substrings) never produce null elements, so
    * the case is unreachable in every caller; parity with the HOF
    * forms is pinned on real tokenizer output.
    */
  def pack(features: ArrayData, bits: Int, md5Mode: Boolean): Long = {
    val n = features.numElements()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val f = features.getUTF8String(i)
      if (f != null) {
        // f.getBytes IS the UTF-8 encoding (UTF8String stores UTF-8) —
        // no toString round-trip through UTF-16 in the per-feature loop
        val fb = f.getBytes
        val h =
          if (md5Mode) PortableMinHashBands.hash60(fb)
          else XXH64.hashUnsafeBytes(fb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, fb.length, 42L)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
