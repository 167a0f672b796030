package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness testdata (TESTDATA.md): one parquet file per
  * table under the scale-factor directory. Mirrors the reference's
  * raw-parquet scan entry point (reference: IngestionJob.scala:32-34)
  * including the mergeSchema option so heterogeneous file sets union
  * their schemas across footers.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame     = read(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = read(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = read(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = read(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = read(spark, d, "lineitem")
  /** The events table stores INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; read nanos as long and truncate to
    * micros (matching DuckDB's TIMESTAMP_NS -> TIMESTAMP cast).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame  = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
