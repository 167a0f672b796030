package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.TableIO

/** NOT NULL column constraints (Delta's most-used constraint, the
  * sibling of q155's CHECK machinery): declared at CREATE or via
  * ALTER COLUMN ... SET NOT NULL (validated against existing rows up
  * front), enforced in the same single write pass as CHECK predicates
  * for programmatic writes and through the reported schema for SQL
  * writes, DROP NOT NULL re-admits nulls.
  */
class NotNullConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_nnwh_").toString
  private lazy val io: TableIO = {
    spark.conf.set("spark.sql.catalog.gnn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnn.warehouse", wh)
    TableIO(spark, wh)
  }
  private def version(t: String): Int = io.catalog.currentVersion(t).getOrElse(0)

  test("CREATE TABLE ... NOT NULL: SQL and programmatic null writes refuse without committing") {
    io
    spark.sql("CREATE TABLE gnn.default.t1 (k BIGINT NOT NULL, s STRING)")
    spark.sql("INSERT INTO gnn.default.t1 VALUES (1, 'a')")
    val v = version("default.t1")
    // SQL insert of an explicit NULL into the NOT NULL column
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO gnn.default.t1 VALUES (NULL, 'b')")
    }
    assert(version("default.t1") == v, s"violating SQL insert must not commit: ${e1.getMessage}")
    // programmatic append with a null key
    val e2 = intercept[Exception] {
      io.append(Seq((None: Option[Long], "c")).toDF("k", "s"), "default.t1")
    }
    assert(e2.getMessage != null)
    assert(version("default.t1") == v, "violating programmatic append must not commit")
    assert(io.read("default.t1").count() == 1)
  }

  test("a batch MISSING the NOT NULL column refuses unless a DEFAULT fills it") {
    io
    spark.sql("CREATE TABLE gnn.default.t2 (k BIGINT NOT NULL, s STRING)")
    val e = intercept[Exception] {
      io.append(Seq(("only-s")).toDF("s"), "default.t2")
    }
    assert(e.getMessage.contains("missing NOT NULL column"), e.getMessage)
    // with a DEFAULT the existence fill serves the value — admitted
    spark.sql("CREATE TABLE gnn.default.t2d (k BIGINT NOT NULL DEFAULT 7, s STRING)")
    io.append(Seq(("fill-me")).toDF("s"), "default.t2d")
    val r = spark.table("gnn.default.t2d").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "fill-me")
  }

  test("nullable -> NOT NULL ALTER validates existing rows; passes after cleanup; DROP re-admits") {
    io
    spark.sql("CREATE TABLE gnn.default.t3 (k BIGINT, s STRING)")
    io.append(Seq((Some(1L), "a"), (None, "b")).toDF("k", "s"), "default.t3")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gnn.default.t3 ALTER COLUMN k SET NOT NULL")
    }
    assert(e.getMessage.contains("existing rows hold nulls"), e.getMessage)
    // still nullable — a null write keeps landing
    io.append(Seq((None: Option[Long], "c")).toDF("k", "s"), "default.t3")
    // clean up, re-run the ALTER, enforcement starts
    spark.sql("DELETE FROM gnn.default.t3 WHERE k IS NULL")
    spark.sql("ALTER TABLE gnn.default.t3 ALTER COLUMN k SET NOT NULL")
    assert(!spark.table("gnn.default.t3").schema("k").nullable)
    val v = version("default.t3")
    intercept[Exception] {
      io.append(Seq((None: Option[Long], "d")).toDF("k", "s"), "default.t3")
    }
    assert(version("default.t3") == v)
    // DROP NOT NULL re-admits nulls
    spark.sql("ALTER TABLE gnn.default.t3 ALTER COLUMN k DROP NOT NULL")
    io.append(Seq((None: Option[Long], "e")).toDF("k", "s"), "default.t3")
    assert(io.read("default.t3").filter(col("k").isNull).count() == 1)
  }

  test("NOT NULL follows RENAME COLUMN; coexists with CHECK constraints") {
    io
    spark.sql("CREATE TABLE gnn.default.t4 (k BIGINT NOT NULL, amt DOUBLE)")
    spark.sql("ALTER TABLE gnn.default.t4 ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    spark.sql("ALTER TABLE gnn.default.t4 RENAME COLUMN k TO key_id")
    assert(!spark.table("gnn.default.t4").schema("key_id").nullable,
      "NOT NULL must ride the rename")
    spark.sql("INSERT INTO gnn.default.t4 VALUES (1, 2.5)")
    val v = version("default.t4")
    intercept[Exception] { // NOT NULL under the NEW name
      io.append(Seq((None: Option[Long], 1.0)).toDF("key_id", "amt"), "default.t4")
    }
    intercept[Exception] { // CHECK still enforced alongside
      io.append(Seq((Some(2L), -1.0)).toDF("key_id", "amt"), "default.t4")
    }
    assert(version("default.t4") == v)
    assert(io.read("default.t4").count() == 1)
  }
}
