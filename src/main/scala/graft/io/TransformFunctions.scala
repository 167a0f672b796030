package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** The hidden-partition-transform V2 catalog functions — the
  * function-catalog half of storage-partitioned joins (the mechanism
  * Iceberg uses, reference: the Iceberg catalog its jobs sit on). When
  * the DSv2 scan reports `KeyGroupedPartitioning` over the table's
  * layout transforms, Spark resolves each transform against the
  * table's catalog ([[GraftCatalog]] implements `FunctionCatalog`);
  * two tables whose scans report the SAME bound functions (equal
  * `canonicalName`s, equal literals, matching key types) are provably
  * co-partitioned and their joins/aggregations plan with ZERO exchange
  * — at 100 TB the difference between a shuffle-free fact-fact join
  * and two full shuffles.
  *
  * Every `produceResult` evaluates the exact write-side layout
  * arithmetic ([[PartitionTransforms]]): bucket = `pmod(murmur3(v,
  * seed 42), n)`, days/hours = floor-division of epoch micros, months/
  * years = calendar on the epoch day (UTC-fixed), truncate = code-point
  * prefix (strings) / floored multiple (integrals) — so anything Spark
  * computes from a function agrees with the directory values
  * bit-for-bit. Canonical names embed the key's type: Murmur3 of an
  * INT is not Murmur3 of its LONG widening.
  */
private[io] object TransformFunctions {

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(GraftBucketFunction)
    case "days" => Some(timeFn("days"))
    case "hours" => Some(timeFn("hours"))
    case "months" => Some(timeFn("months"))
    case "years" => Some(timeFn("years"))
    case "truncate" => Some(TruncateFunction)
    case _ => None
  }

  val names: Seq[String] = Seq("bucket", "days", "hours", "months", "years", "truncate")

  private val DayMicros = 86400000000L
  private val HourMicros = 3600000000L

  /** Epoch days of a catalyst time value (TimestampType = micros Long,
    * DateType = days Int) — floor division, UTC-fixed like the write
    * side.
    */
  private def epochDays(v: Any, dt: DataType): Long = dt match {
    case DateType => v.asInstanceOf[Int].toLong
    case _ => Math.floorDiv(v.asInstanceOf[Long], DayMicros)
  }

  private def timeFn(kind: String): UnboundFunction = new UnboundFunction {
    override def name(): String = kind
    override def description(): String =
      s"$kind(col): graft hidden-spec time transform (UTC-fixed)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$kind takes one time column, got ${inputType.catalogString}")
      val srcType = inputType.fields(0).dataType
      require(srcType == TimestampType || srcType == DateType ||
        srcType.typeName == "timestamp_ntz",
        s"$kind needs a timestamp/date column, got ${srcType.catalogString}")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = LongType
        override def name(): String = kind
        override def canonicalName(): String = s"graft.$kind(${srcType.catalogString})"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): java.lang.Long = {
          val v = input.get(0, srcType)
          kind match {
            case "days" => epochDays(v, srcType)
            case "hours" => srcType match {
              case DateType => v.asInstanceOf[Int].toLong * 24
              case _ => Math.floorDiv(v.asInstanceOf[Long], HourMicros)
            }
            case "months" =>
              val ld = java.time.LocalDate.ofEpochDay(epochDays(v, srcType))
              (ld.getYear - 1970).toLong * 12 + ld.getMonthValue - 1
            case "years" =>
              (java.time.LocalDate.ofEpochDay(epochDays(v, srcType)).getYear - 1970).toLong
          }
        }
      }
    }
  }

  private object TruncateFunction extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): code-point prefix (strings) / floored multiple (integrals)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width, col), got ${inputType.catalogString}")
      val wType = inputType.fields(0).dataType
      val srcType = inputType.fields(1).dataType
      def widthOf(input: InternalRow): Int = input.get(0, wType) match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.toInt
        case other => other.toString.toInt
      }
      srcType match {
        case StringType => new ScalarFunction[UTF8String] {
          override def inputTypes(): Array[DataType] = Array(wType, srcType)
          override def resultType(): DataType = StringType
          override def name(): String = "truncate"
          override def canonicalName(): String = s"graft.truncate(string)"
          override def isResultNullable: Boolean = false
          override def produceResult(input: InternalRow): UTF8String =
            UTF8String.fromString(PartitionTransforms.cpTruncate(
              input.get(1, srcType).toString, widthOf(input)))
        }
        case _ => new ScalarFunction[java.lang.Long] {
          override def inputTypes(): Array[DataType] = Array(wType, srcType)
          override def resultType(): DataType = LongType
          override def name(): String = "truncate"
          override def canonicalName(): String =
            s"graft.truncate(${srcType.catalogString})"
          override def isResultNullable: Boolean = false
          override def produceResult(input: InternalRow): java.lang.Long = {
            val w = widthOf(input).toLong
            val l = input.get(1, srcType) match {
              case i: java.lang.Integer => i.longValue()
              case l0: java.lang.Long => l0.longValue()
              case s: java.lang.Short => s.longValue()
              case b: java.lang.Byte => b.longValue()
              case other => other.toString.toLong
            }
            l - (((l % w) + w) % w)
          }
        }
      }
    }
  }
}

/** The `bucket(n, col)` V2 function — see [[TransformFunctions]]. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, seed 42), n) — graft hidden-spec layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.catalogString}")
    val nType = inputType.fields(0).dataType
    val keyType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(nType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.get(0, nType) match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.toInt
          case other => other.toString.toInt
        }
        val h = Murmur3HashFunction.hash(input.get(1, keyType), keyType, 42L).toInt
        ((h % n) + n) % n
      }
    }
  }
}
