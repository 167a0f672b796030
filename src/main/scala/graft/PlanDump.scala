package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` output for named queries to
  * `<outDir>/<qNN>_<suffix>.txt` — the round's before/after plan
  * artifacts (plans/r21/...). Usage:
  *   sbt "runMain graft.PlanDump plans/r21 after q146_dsir_selection ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val spark = SessionFactory.build("graft-plandump")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { name =>
      val txt =
        try {
          val df = SparkEntry.queries(name)(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Throwable => s"FAILED to build plan: $e" }
      val f = outDir.resolve(s"${name.split('_').head}_$suffix.txt")
      Files.writeString(f, s"== $name ($suffix) ==\n\n" + txt)
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
