package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The `bucket(n, col)` V2 catalog function — the function-catalog half
  * of storage-partitioned joins (the mechanism Iceberg uses, reference:
  * the Iceberg catalog its jobs sit on). When the DSv2 scan reports
  * `KeyGroupedPartitioning(bucket(n, key))`, Spark resolves the
  * transform against the table's catalog ([[GraftCatalog]] implements
  * `FunctionCatalog`) and joins of two tables whose scans report the
  * SAME bound function (equal `canonicalName`, equal bucket count,
  * join keys = bucket sources) plan with ZERO exchange — at 100 TB the
  * difference between a shuffle-free fact-fact join and two full
  * shuffles.
  *
  * `produceResult` evaluates the exact write-side layout hash
  * ([[PartitionTransforms.Bucket]]: `pmod(hash(c), n)`, Murmur3 seed
  * 42), so anything Spark computes from the function agrees with the
  * directory values bit-for-bit. The canonical name embeds the key's
  * type: Murmur3 of an INT is not Murmur3 of its LONG widening, so two
  * tables co-partition only when their key types match.
  */
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
