package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-side schema evolution (r19 verdict item 4): `MERGE WITH
  * SCHEMA EVOLUTION INTO` lands a source's new column in the SAME
  * commit as the row changes (Spark 4.1's AUTOMATIC_SCHEMA_EVOLUTION
  * capability routed through the catalog's validated alterTable), old
  * snapshots time-travel clean, lossless type widening composes, and
  * incompatible retypes refuse by the `widens` rule. A plain MERGE
  * (no WITH clause) keeps refusing unknown source columns.
  */
class MergeSchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_sewh_").toString
  private lazy val io: TableIO = {
    spark.conf.set(s"spark.sql.catalog.gse", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gse.warehouse", wh)
    TableIO(spark, wh)
  }

  private def freshBase(t: String): Unit = {
    io.catalog.dropTable(t)
    io.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "s", "amt"), t)
  }

  test("MERGE WITH SCHEMA EVOLUTION lands a new source column in one commit") {
    freshBase("default.se1")
    val v0 = io.catalog.currentVersion("default.se1").get
    Seq((2L, "b2", 21.0, "fresh"), (9L, "i", 90.0, "new"))
      .toDF("id", "s", "amt", "note").createOrReplaceTempView("se1_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gse.default.se1 t USING se1_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("se1_src")
    // exactly ONE data commit for rows + schema (the ALTER is
    // metadata; the rewrite is the version hop)
    assert(io.catalog.currentVersion("default.se1").get == v0 + 1)
    val out = io.read("default.se1").orderBy("id")
      .as[(Long, String, Double, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0, None), // untouched row serves null for the new column
      (2L, "b2", 21.0, Some("fresh")),
      (3L, "c", 30.0, None),
      (9L, "i", 90.0, Some("new"))))
    // the declared schema evolved (nullable, at the end)
    val f = io.read("default.se1").schema("note")
    assert(f.nullable && f.dataType.typeName == "string")
    // old snapshots time-travel clean: the version's DATA is intact
    // and the post-evolution column reads null for every old row (the
    // declared schema is table-level — read-under-latest-schema, with
    // old files null-filling the new column; never stale bytes)
    val old = io.readVersion("default.se1", v0)
    assert(old.count() == 3)
    assert(old.filter(col("note").isNotNull).count() == 0,
      "pre-evolution rows must never resurrect values for the new column")
    assert(old.select("id", "s", "amt").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("plain MERGE (no WITH clause) never evolves: the extra source column doesn't land") {
    freshBase("default.se2")
    Seq((2L, "x", 1.0, "nope"), (7L, "g", 7.0, "nor"))
      .toDF("id", "s", "amt", "note").createOrReplaceTempView("se2_src")
    try {
      // Spark's star expansion assigns TARGET columns by name and
      // ignores extra source columns — the schema must not change
      spark.sql(
        """MERGE INTO gse.default.se2 t USING se2_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(io.read("default.se2").columns.toSeq == Seq("id", "s", "amt"),
        "a plain MERGE must not widen the table schema")
      // an explicit assignment to the unknown column DOES refuse
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
        """MERGE INTO gse.default.se2 t USING se2_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.note = s.note""".stripMargin))
      assert(e.getMessage.toLowerCase.contains("note"), e.getMessage)
    } finally spark.catalog.dropTempView("se2_src")
  }

  test("evolution widens a column type losslessly in the same statement") {
    io.catalog.dropTable("default.se3")
    io.overwrite(Seq((1, 10), (2, 20)).toDF("id", "qty"), "default.se3")
    // source carries qty as LONG — int->long is a lossless widen
    Seq((2L, 200L), (5L, 500L)).toDF("id", "qty").createOrReplaceTempView("se3_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gse.default.se3 t USING se3_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("se3_src")
    assert(io.read("default.se3").schema("qty").dataType.typeName == "long")
    val got = io.read("default.se3").orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 200L), (5L, 500L)))
  }

  test("a lossy retype refuses with the widens rule named; nothing commits") {
    freshBase("default.se4")
    val v0 = io.catalog.currentVersion("default.se4").get
    // amt is DOUBLE in the target; a STRING source cannot widen it
    Seq((2L, "b", "not-a-number")).toDF("id", "s", "amt")
      .createOrReplaceTempView("se4_src")
    try {
      val e = intercept[Exception](spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO gse.default.se4 t USING se4_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
      assert(e.getMessage.contains("lossless widenings") ||
        e.getMessage.toLowerCase.contains("cannot"), e.getMessage)
      assert(io.catalog.currentVersion("default.se4").get == v0, "no partial commit")
    } finally spark.catalog.dropTempView("se4_src")
  }

  test("evolution composes with NOT NULL / CHECK constraints on existing columns") {
    freshBase("default.se5")
    spark.sql("ALTER TABLE gse.default.se5 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    Seq((7L, "g", 70.0, 1)).toDF("id", "s", "amt", "flag")
      .createOrReplaceTempView("se5_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gse.default.se5 t USING se5_src s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView("se5_src")
    assert(io.read("default.se5").filter(col("flag") === 1).count() == 1)
    // the constraint still guards the evolved table
    Seq((8L, "h", -5.0, 2)).toDF("id", "s", "amt", "flag")
      .createOrReplaceTempView("se5_bad")
    try intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gse.default.se5 t USING se5_bad s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    finally spark.catalog.dropTempView("se5_bad")
    assert(io.read("default.se5").filter(col("amt") < 0).count() == 0)
  }
}
