package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a true aggregate:
  * `graft_topk(score, id1, id2, k)` keeps the k best
  * (score DESC, id1 ASC, id2 ASC) rows in an O(k) buffer and returns
  * them as a sorted `array<struct<score, id1, id2>>`.
  *
  * Scale rationale: per-group top-k via
  * `row_number().over(Window.partitionBy(g))` requires a shuffle to
  * |distinct g| partitions followed by a full per-partition sort — with
  * a low-cardinality key (e.g. 3 return flags) the sort runs in at
  * most 3 tasks no matter how big the cluster is, over the ENTIRE
  * input. As an aggregate, the partial (map-side) phase reduces every
  * input partition to ≤ k rows per group before the exchange, the
  * shuffle carries ≤ groups x partitions x k rows, and the final merge
  * is O(k) per group — the classic two-level top-k. Inputs with a null
  * score or id are ignored (they cannot rank).
  */
case class TopKByScore(
    score: Expression,
    id1: Expression,
    id2: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"graft_topk k must be positive, got $k")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id1, id2)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id1", LongType, nullable = false),
      StructField("id2", IntegerType, nullable = false)
    )),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val a = id1.eval(input)
    val b = id2.eval(input)
    if (s != null && a != null && b != null) {
      buffer.insert(s.asInstanceOf[Double], a.asInstanceOf[Long], b.asInstanceOf[Int])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) {
      buffer.insert(other.scores(i), other.id1s(i), other.id2s(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = InternalRow(buffer.scores(i), buffer.id1s(i), buffer.id2s(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 20)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.id1s(i)); bb.putInt(buffer.id2s(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong, bb.getInt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id1 = newChildren(1), id2 = newChildren(2))
}

/** Fixed-capacity buffer ordered best-first by (score DESC, id1 ASC,
  * id2 ASC). Inserts reject in O(1) against the current k-th entry, so
  * after warm-up the per-row cost on a scan is one comparison.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val id1s: Array[Long] = new Array[Long](k)
  val id2s: Array[Int] = new Array[Int](k)

  // true if (s, a, b) ranks strictly better than entry i
  private def better(s: Double, a: Long, b: Int, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && (a < id1s(i) || (a == id1s(i) && b < id2s(i))))

  def insert(s: Double, a: Long, b: Int): Unit = {
    // NaN compares false both ways, which would let a NaN row slot in
    // unordered — treat it like null input and skip.
    if (java.lang.Double.isNaN(s)) return
    if (n == k && !better(s, a, b, n - 1)) return
    var pos = if (n == k) n - 1 else n
    if (n < k) n += 1
    while (pos > 0 && better(s, a, b, pos - 1)) {
      scores(pos) = scores(pos - 1); id1s(pos) = id1s(pos - 1); id2s(pos) = id2s(pos - 1)
      pos -= 1
    }
    scores(pos) = s; id1s(pos) = a; id2s(pos) = b
  }
}
