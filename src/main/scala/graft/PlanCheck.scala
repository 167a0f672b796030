package graft
/** CI gate for the q30 tokenizer-hoist: the physical plan of
  * `TextAnalysis.topTokens` must contain exactly ONE `split(` — if a
  * future optimizer change (e.g. CollapseProject inlining the hoisted
  * `tokens` alias back into the Generate) re-duplicates the regex
  * tokenize, this exits non-zero instead of relying on a human reading
  * stdout.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = SessionFactory.build("graft-plancheck")
    try {
      val df = graft.text.TextAnalysis.topTokens(graft.tables.Tables.documents(spark, sfDir), k = 31)
      val p = df.queryExecution.executedPlan.toString
      val nSplit = "split\\(".r.findAllIn(p).length
      println(s"[plancheck] split occurrences in physical plan: $nSplit")
      if (nSplit != 1) {
        println(p.take(6000))
        throw new IllegalStateException(
          s"[plancheck] FAIL: expected exactly 1 split( in q30 plan, found $nSplit — tokenizer hoist regressed")
      }
      println("[plancheck] OK")
    } finally spark.stop()
  }
}
