package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query job/stage attribution (guide §1: measure first).
  *
  * Runs named queries once (after one untimed warm run of the FIRST
  * argument if SPARK_GRAFT_PROFILE_WARM=1) and prints, per query:
  *   - total wall seconds
  *   - every Spark job: wall ms, summed executor task time, shuffle
  *     read/write bytes, callsite — sorted by wall ms
  *   - the DRIVER GAP: wall time not covered by any job (planning,
  *     commit machinery, metadata IO, fsyncs) — the part invisible in
  *     job metrics but very visible in the bench.
  *
  *   sbt "runMain graft.Profile q161_ann_ivfpq q57_incremental_curation"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var callsite: String = "", var desc: String = "")
    final case class StageRec(id: Int, nTasks: Int, name: String, wallMs: Long,
        taskMs: Long, shufR: Long, shufW: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val r = JobRec(e.jobId, e.time)
        r.callsite = Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        r.desc = Option(e.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = r
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val si = e.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages(si.stageId) = StageRec(si.stageId, si.numTasks, si.name.take(70), wall,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // planning-phase accounting: every DataFrame action's analysis /
    // optimization / physical-planning driver time, summed per query
    val phaseTotals = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def record(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        qe.tracker.phases.foreach { case (phase, summary) =>
          phaseTotals.computeIfAbsent(phase, _ => new java.util.concurrent.atomic.LongAdder)
            .add(summary.durationMs)
        }
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = record(qe)
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = record(qe)
    }
    spark.listenerManager.register(qeListener)

    val names = if (args.nonEmpty) args.toSeq else Seq("q161_ann_ivfpq")
    if (sys.env.get("SPARK_GRAFT_PROFILE_WARM").contains("1")) {
      try SparkEntry.queries(names.head)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[warm] ${e.getMessage}") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    names.foreach { name =>
      jobs.clear(); stages.clear(); stageToJob.clear()
      graft.io.Timers.reset(); phaseTotals.clear()
      val t0 = System.nanoTime()
      val n =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"[$name] FAILED: $e"); -1L }
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let listener events drain
      val snap = listener.synchronized { jobs.values.toVector }
      val covered = {
        // union of job intervals (driver gap = wall - covered)
        val iv = snap.filter(_.end > 0).map(j => (j.start, j.end)).sortBy(_._1)
        var tot = 0L; var curS = -1L; var curE = -1L
        iv.foreach { case (s0, e0) =>
          if (curE < 0) { curS = s0; curE = e0 }
          else if (s0 <= curE) { curE = math.max(curE, e0) }
          else { tot += curE - curS; curS = s0; curE = e0 }
        }
        if (curE >= 0) tot += curE - curS
        tot
      }
      println(f"\n===== $name rows=$n wall=${wallMs / 1000}%.2fs jobs=${snap.size} jobTime=${covered / 1000.0}%.2fs driverGap=${(wallMs - covered) / 1000.0}%.2fs =====")
      val snapStages = listener.synchronized { stages.values.toVector }
      snapStages.sortBy(s => -s.wallMs).take(25).foreach { s =>
        println(f"  stage ${s.id}%4d job=${stageToJob.getOrElse(s.id, -1)}%4d n=${s.nTasks}%3d wall=${s.wallMs}%6d ms task=${s.taskMs}%7d ms shufR=${s.shufR / 1024}%7d KB shufW=${s.shufW / 1024}%7d KB  ${s.name}")
      }
      import scala.jdk.CollectionConverters._
      val phases = phaseTotals.asScala.toSeq.map { case (k, v) => k -> v.sum() }
        .sortBy(-_._2).map { case (k, v) => f"$k=$v%d ms" }.mkString(", ")
      println(s"  planning phases: $phases")
      graft.io.Timers.snapshot().foreach { case (label, sec, n) =>
        println(f"  timer $label%-26s ${sec}%7.3f s  n=$n")
      }
    }
    spark.stop()
  }
}
