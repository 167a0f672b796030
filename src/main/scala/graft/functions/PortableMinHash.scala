package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MD5-portable MinHash signature, banded:
  * `graft_minhash_md5_bands(shingles, k, bands)` returns one
  * `struct<band int, sig_a long, sig_b long, band_key long>` per band
  * (r = 2 signature rows per band).
  *
  * The hash is deliberately PORTABLE rather than fast-path xxhash64:
  * shingle hash = first 60 bits of md5 (== `conv(substr(md5(s),1,15),
  * 16,10)` in Spark SQL, `('0x' || substr(md5(s),1,15))::BIGINT` in
  * DuckDB), k hash functions via Kirsch–Mitzenmacher double hashing
  * mod the Mersenne prime 2^31-1 — every step reproducible in plain
  * SQL on an independent engine, so the whole signature is
  * value-checkable by the DuckDB oracle. This native kernel exists
  * because the equivalent higher-order-function formulation
  * (`Dedup.portableMinhashBandsReference`, kept as the executable
  * specification) is interpreted and ~7x slower; a spec pins the two
  * equal row-for-row.
  */
case class PortableMinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k == 2 * bands, s"r is fixed at 2 rows per band: k=$k, bands=$bands")

  override def prettyName: String = "graft_minhash_md5_bands"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("sig_a", LongType, nullable = false),
      StructField("sig_b", LongType, nullable = false),
      StructField("band_key", LongType, nullable = false)
    )),
    containsNull = false
  )
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PortableMinHashBands.bandRows(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PortableMinHashBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.bandRows($a, $k, $bands);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableMinHashBands {
  final val P = 2147483647L // Mersenne prime 2^31-1

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): bytes 0..7 big-endian, unsigned-shifted
    * right by 4 == the first 15 hex chars parsed base 16.
    */
  def hash60(bytes: Array[Byte]): Long = hash60(bytes, 0, bytes.length)

  /** Slice variant: md5 over `bytes[off, off+len)` without copying. */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    val h = d.digest()
    val top =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
        ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    top >>> 4
  }

  /** Shared kernel for interpreted eval and codegen. */
  def bandRows(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        val h = hash60(s.getBytes)
        val h2 = 1L + (h / P) % P
        var g = h % P
        var i = 0
        while (i < k) {
          if (g < sig(i)) sig(i) = g
          g += h2
          if (g >= P) g -= P
          i += 1
        }
      }
      j += 1
    }
    val rows = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val a = sig(2 * b); val c = sig(2 * b + 1)
      rows(b) = InternalRow(b, a, c, a * P + c)
      b += 1
    }
    new GenericArrayData(rows)
  }
}
