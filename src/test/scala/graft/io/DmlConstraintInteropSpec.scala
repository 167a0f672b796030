package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-feature interop (r19): the round's constraint features must
  * hold through the round's DML paths — an UPDATE/MERGE is just
  * another write, and a constraint that only guards INSERT is a
  * loophole, not a constraint.
  */
class DmlConstraintInteropSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(cname: String): TableIO = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_dci_${cname}_").toString
    spark.conf.set(s"spark.sql.catalog.$cname", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
    TableIO(spark, wh)
  }

  test("UPDATE cannot write NULL into a NOT NULL column (partitioned + unpartitioned)") {
    val io = freshCat("dci1")
    spark.sql("CREATE TABLE dci1.default.flat (k BIGINT NOT NULL, s STRING)")
    spark.sql("INSERT INTO dci1.default.flat VALUES (1, 'a')")
    val v1 = io.catalog.currentVersion("default.flat").get
    intercept[Exception] {
      spark.sql("UPDATE dci1.default.flat SET k = NULL WHERE s = 'a'")
    }
    assert(io.catalog.currentVersion("default.flat").get == v1,
      "a NOT NULL-violating UPDATE must not commit")
    assert(io.read("default.flat").filter(col("k").isNull).count() == 0)

    spark.sql("CREATE TABLE dci1.default.part (k BIGINT NOT NULL, yr INT) PARTITIONED BY (yr)")
    spark.sql("INSERT INTO dci1.default.part VALUES (1, 2020)")
    val v2 = io.catalog.currentVersion("default.part").get
    intercept[Exception] {
      spark.sql("UPDATE dci1.default.part SET k = NULL WHERE yr = 2020")
    }
    assert(io.catalog.currentVersion("default.part").get == v2)
  }

  test("UPDATE and MERGE cannot violate a CHECK constraint") {
    val io = freshCat("dci2")
    spark.sql("CREATE TABLE dci2.default.chk (k BIGINT, bal DOUBLE)")
    spark.sql("INSERT INTO dci2.default.chk VALUES (1, 10.0)")
    spark.sql("ALTER TABLE dci2.default.chk ADD CONSTRAINT bal_pos CHECK (bal >= 0)")
    val v1 = io.catalog.currentVersion("default.chk").get
    intercept[Exception] {
      spark.sql("UPDATE dci2.default.chk SET bal = -5.0 WHERE k = 1")
    }
    assert(io.catalog.currentVersion("default.chk").get == v1,
      "a CHECK-violating UPDATE must not commit")
    Seq((1L, -3.0)).toDF("k", "delta").createOrReplaceTempView("dci2_src")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO dci2.default.chk t USING dci2_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET bal = s.delta""".stripMargin)
    }
    spark.catalog.dropTempView("dci2_src")
    assert(io.catalog.currentVersion("default.chk").get == v1,
      "a CHECK-violating MERGE must not commit")
    assert(io.read("default.chk").head().getDouble(1) == 10.0)
  }

  test("a LEGAL update through both constraint kinds still lands") {
    val io = freshCat("dci3")
    spark.sql("CREATE TABLE dci3.default.ok (k BIGINT NOT NULL, bal DOUBLE, yr INT) " +
      "PARTITIONED BY (yr)")
    spark.sql("ALTER TABLE dci3.default.ok ADD CONSTRAINT bal_pos CHECK (bal >= 0)")
    spark.sql("INSERT INTO dci3.default.ok VALUES (1, 10.0, 2020)")
    spark.sql("UPDATE dci3.default.ok SET bal = 11.5 WHERE k = 1")
    assert(io.read("default.ok").select("bal").head().getDouble(0) == 11.5)
  }
}
