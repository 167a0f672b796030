package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.tables.Tables

/** Guards against testdata physical-type drift (SURVEY.md §7 risk 5).
  *
  * Round 11 post-mortem: the events fixture was regenerated from INT64
  * TIMESTAMP(NANOS) to plain TIMESTAMP(MICROS) and every events
  * consumer failed at plan time — but no test loaded the real fixture
  * through Tables.events, so 7 queries silently dropped out of the
  * correctness sweep. This suite fails loudly if the fixtures drift
  * again: every loader must produce an analyzable, actionable frame on
  * every scale dir, and the events `ts` column must normalize to
  * TimestampType from BOTH physical vintages.
  */
class TablesDriftSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
  private val tables = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
    "region"     -> Tables.region,
    "nation"     -> Tables.nation,
    "customer"   -> Tables.customer,
    "supplier"   -> Tables.supplier,
    "part"       -> Tables.part,
    "orders"     -> Tables.orders,
    "lineitem"   -> Tables.lineitem,
    "events"     -> Tables.events,
    "documents"  -> Tables.documents,
    "embeddings" -> Tables.embeddings
  )

  test("every loader loads and acts on every scale dir") {
    for (dir <- sfDirs; (name, load) <- tables) {
      val df = load(spark, dir)
      assert(df.head(1).nonEmpty, s"$name at $dir is empty")
    }
  }

  test("events ts normalizes to TimestampType on the current fixture") {
    for (dir <- sfDirs) {
      val e = Tables.events(spark, dir)
      assert(e.schema("ts").dataType == TimestampType, s"ts type drift at $dir: ${e.schema("ts").dataType}")
      // The r11 breakage was a plan-time DATATYPE_MISMATCH in a ts
      // consumer — force the same expression family through analysis.
      val r = e.select(unix_micros(col("ts")).as("us"), date_trunc("hour", col("ts")).as("h")).head()
      assert(r.getLong(0) > 0L)
    }
  }

  test("events ts normalizes from the legacy long-nanos vintage") {
    // The legacy fixture stored INT64 TIMESTAMP(NANOS), which the
    // nanosAsLong conf scans as LongType. Simulate that vintage with a
    // plain long ts column (same scanned type, same branch).
    val dir = Files.createTempDirectory("graft-drift").toFile.getAbsolutePath
    val micros = 1700000000000000L // 2023-11-14T22:13:20Z
    import spark.implicits._
    Seq((1L, micros * 1000L, "click", 7L, 1.5, "{}"))
      .toDF("event_id", "ts", "event_type", "user_id", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType)
    assert(e.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("both vintages yield the same instant for the same micros value") {
    // Cross-check: read the real fixture's first event, re-encode its
    // instant as long nanos, run it through the legacy branch, and
    // require the identical TimestampType value back.
    val real  = Tables.events(spark, "/root/testdata/sf0.001")
    val first = real.select(unix_micros(col("ts"))).head().getLong(0)
    val dir   = Files.createTempDirectory("graft-drift2").toFile.getAbsolutePath
    import spark.implicits._
    Seq(Tuple1(first * 1000L)).toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = Tables.events(spark, dir)
    assert(legacy.select(unix_micros(col("ts"))).head().getLong(0) == first)
  }
}
