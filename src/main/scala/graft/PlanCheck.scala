package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SessionFactory.build("graft-plancheck")
    val df = graft.text.TextAnalysis.topTokens(graft.tables.Tables.documents(spark, "/root/testdata/sf0.001"), k = 31)
    val p = df.queryExecution.executedPlan.toString
    val nSplit = "split\\(".r.findAllIn(p).length
    println(s"[plancheck] split occurrences in physical plan: $nSplit")
    println(p.take(6000))
    spark.stop()
  }
}
