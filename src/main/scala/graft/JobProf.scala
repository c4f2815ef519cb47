package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Dev profiler (r21): runs one query under Bench's exact conditions and
  * prints every Spark JOB it executes — wall seconds, stage count, task
  * count, shuffle read/write bytes — so a multi-job operator's time can
  * be attributed to its internal phases (guide §1: measure first; the
  * UI is disabled in bench sessions, so this is the listener-level
  * equivalent of the Jobs page).
  *
  * Usage: runMain graft.JobProf <query> [query...]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-jobprof")
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()

    case class Job(id: Int, desc: String, t0: Long) {
      var t1: Long = 0L
      var stages = 0
      var tasks = 0
      var shufRead = 0L
      var shufWrite = 0L
      var input = 0L
    }
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(e.stageInfos.map(_.name).lastOption.getOrElse(""))
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, desc, e.time)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (j <- stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get)) {
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
            val m = e.stageInfo.taskMetrics
            if (m != null) {
              j.shufRead += m.shuffleReadMetrics.totalBytesRead
              j.shufWrite += m.shuffleWriteMetrics.bytesWritten
              j.input += m.inputMetrics.bytesRead
            }
          }
        }
    }

    args.foreach { name =>
      def once(): Unit = SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      def clear(): Unit = {
        operators.ScratchCache.releaseAll()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      try once() catch { case e: Throwable =>
        System.err.println(s"[jobprof] $name warmup FAILED: $e") }
      clear()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      val sec = (t1 - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; give it a moment to drain
      Thread.sleep(500)
      // build = query construction (may run eager sub-jobs, e.g. CC);
      // gap = action wall minus the union of job intervals — driver-side
      // planning/codegen/commit time between jobs (guide §7.3)
      val intervals = jobs.synchronized {
        jobs.values.map(j => (j.t0, j.t1)).filter(_._2 > 0).toSeq.sorted }
      val covered = intervals.foldLeft((0L, 0L)) {
        case ((sum, hi), (a, b)) =>
          (sum + math.max(0L, b - math.max(a, hi)), math.max(hi, b))
      }._1 / 1e3
      println(f"[jobprof] ===== $name total $sec%.2f s " +
        f"(build ${(tBuild - t0) / 1e9}%.2f, action ${(t1 - tBuild) / 1e9}%.2f, " +
        f"jobs-covered $covered%.2f), ${jobs.size} jobs =====")
      def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f"
      jobs.synchronized {
        jobs.values.foreach { j =>
          val w = (j.t1 - j.t0) / 1e3
          println(f"[jobprof] job ${j.id}%3d $w%7.2f s stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d in=${mb(j.input)}%8s MB " +
            f"sr=${mb(j.shufRead)}%8s MB sw=${mb(j.shufWrite)}%8s MB  ${j.desc.take(80)}")
        }
      }
      clear()
    }
    spark.stop()
  }
}
