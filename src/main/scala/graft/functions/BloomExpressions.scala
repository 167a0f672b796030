package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloom, s)` — membership probe of a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the `df.stat.bloomFilter`
  * output, `writeTo`-serialized) against a string column. Returns
  * whether `s` MIGHT be in the set: false positives at the filter's
  * configured fpp, false negatives never — so it is a sound
  * PRE-filter: follow with an exact join on the survivors and the
  * composition stays exact (`Contamination.decontaminateBloom`).
  *
  * The bloom arrives as one binary literal; tasks deserialize it once
  * through a weak identity cache, and the probe hashes the column's
  * UTF-8 bytes directly (`mightContainBinary` — the same bytes
  * `putString` hashed on the build side) so no per-row String
  * materializes. Codegen'd; stays inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_bloom_contains"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bloom: Any, s: Any): Any =
    BloomContains.contains(bloom.asInstanceOf[Array[Byte]], s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BloomContains.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (b, s) => s"${ev.value} = $cls.contains($b, $s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  // Deserialized-filter cache. Weak keys on the literal's byte array:
  // one filter per plan literal per executor, reclaimed when the plan
  // goes away. (WeakHashMap compares arrays by identity — exactly the
  // sharing structure of a broadcast/literal in task closures.)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  // Per-thread memo of the last (bytes -> filter) resolution: the probe
  // runs once per row in the hot codegen path, and going through the
  // synchronized map every row would serialize all executor threads on
  // one monitor. A task probes one filter, so the memo hit rate is
  // ~100% and the map is only consulted on first touch per thread.
  // SOFT reference: executor threads are pooled for the JVM's lifetime,
  // so a strong memo would pin every thread's last bloom (bytes +
  // deserialized bitset) long after the query ended — soft refs keep
  // the fast path until memory pressure, then release, and a cleared
  // memo just falls back to the map once.
  private val lastRef = new ThreadLocal[java.lang.ref.SoftReference[(Array[Byte], BloomFilter)]]

  def contains(bloomBytes: Array[Byte], s: UTF8String): Boolean = {
    val memoRef = lastRef.get()
    val memo = if (memoRef == null) null else memoRef.get()
    val bf =
      if (memo != null && (memo._1 eq bloomBytes)) memo._2
      else {
        var f = cache.get(bloomBytes)
        if (f == null) {
          f = BloomFilter.readFrom(bloomBytes)
          cache.put(bloomBytes, f)
        }
        lastRef.set(new java.lang.ref.SoftReference((bloomBytes, f)))
        f
      }
    bf.mightContainBinary(s.getBytes)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** `graft_bloom_agg(s, expectedItems, fpp)` — build a serialized bloom
  * filter over a string column as a true mergeable-sketch aggregate:
  * map-side partials absorb their partitions, the exchange carries one
  * fixed-size bitset per partition, and the final merge ORs them.
  * Probe with [[BloomContains]] — both sides hash the string's UTF-8
  * bytes (`putBinary`/`mightContainBinary`), so build/probe consistency
  * is by construction rather than by matching some other builder's
  * internals. `expectedItems`/`fpp` size the bitset
  * (`BloomFilter.create`); merging requires identical sizing, which
  * holds because every buffer comes from this literal-parameterized
  * instance.
  */
case class BloomAggregate(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[BloomFilter]
    with ImplicitCastInputTypes {

  require(expectedItems > 0, s"graft_bloom_agg expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"graft_bloom_agg fpp must be in (0,1), got $fpp")

  override def prettyName: String = "graft_bloom_agg"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: org.apache.spark.sql.catalyst.InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = BloomContains.serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = BloomContains.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
