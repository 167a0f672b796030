package graft

import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0)),
    (Array(2.0, 0.0), Array(2.0, 0.0))
  ).toDF("a", "b")

  test("graft_dot matches hand computation") {
    val out = df.select(expr("graft_dot(a, b)").as("d")).as[Double].collect()
    assert(out.toSeq == Seq(32.0, 0.0, 4.0))
  }

  test("graft_cosine matches hand computation incl. orthogonal and identical") {
    val out = df.select(expr("graft_cosine(a, b)").as("c")).as[Double].collect()
    assert(math.abs(out(0) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
    assert(out(1) == 0.0)
    assert(out(2) == 1.0)
  }

  test("expressions agree with the interpreted HOF formulation bit-for-bit") {
    val hof = df.select(expr(
      """aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
        | / (sqrt(aggregate(a, 0D, (acc, v) -> acc + v * v))
        |    * sqrt(aggregate(b, 0D, (acc, v) -> acc + v * v)))""".stripMargin).as("c"))
      .as[Double].collect()
    val native = df.select(expr("graft_cosine(a, b)").as("c")).as[Double].collect()
    assert(hof.toSeq == native.toSeq)
  }

  test("null inputs propagate null") {
    val n = spark.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) c")
    assert(n.head().isNullAt(0))
  }

  test("float arrays implicitly cast to double") {
    val f = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val out = f.select(expr("graft_dot(a, b)").as("d")).as[Double].head()
    assert(out == 11.0)
  }
}
