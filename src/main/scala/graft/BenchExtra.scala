package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1: measure first; §1.4 noop sink).
  *
  * NOT part of the frozen driver contract (Bench.scala is the contract and
  * is untouched) — this is the optimization round's diagnostic tool:
  *
  *   - dumps `.explain("formatted")` for every declared query to
  *     `plans/r06/<query>_<tag>.txt` (the judge-checkable plan evidence);
  *   - times each query with the same noop-sink methodology as Bench
  *     (2 legs, min), but additionally attributes each leg at JOB
  *     granularity: per-job wall + task counts, and the driver-side "gap"
  *     time where no job ran (planning, filesystem work, collects) — the
  *     term the Spark UI would show as idle and that dominates tiny-input
  *     queries.
  *
  * Usage: sbt "runMain graft.BenchExtra [tag] [queryFilter...]"
  *   tag defaults to "probe"; plans land in plans/r06/<q>_<tag>.txt.
  */
object BenchExtra {

  private final class JobTrace extends org.apache.spark.scheduler.SparkListener {
    final case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
        var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    private val taskMs = new java.util.concurrent.atomic.AtomicLong
    private val cpuMs = new java.util.concurrent.atomic.AtomicLong
    private val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs.put(js.jobId, Job(js.jobId, desc, js.time))
      order.add(js.jobId)
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val j = jobs.get(je.jobId)
      if (j != null) j.end = je.time
    }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      taskMs.addAndGet(m.executorRunTime)
      cpuMs.addAndGet(m.executorCpuTime / 1000000)
      gcMs.addAndGet(m.jvmGCTime)
      val jid = order.toArray.lastOption.map(_.asInstanceOf[Int])
      jid.foreach { id =>
        val j = jobs.get(id)
        if (j != null) j.tasks += sc.stageInfo.numTasks
      }
    }
    def snapshot: (Double, Double, Double) =
      (taskMs.get / 1e3, cpuMs.get / 1e3, gcMs.get / 1e3)
    def reset(): Unit = { jobs.clear(); order.clear() }
  }

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("probe")
    val filters = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val planDir = Paths.get("plans/r06")
    Files.createDirectories(planDir)

    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warmup

    val trace = new JobTrace
    spark.sparkContext.addSparkListener(trace)

    def leg(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        report: Boolean): Double = {
      org.apache.spark.sql.GraftShims.drainListenerBus(spark.sparkContext)
      trace.reset()
      val (t0t, t0c, t0g) = trace.snapshot
      val t0 = System.nanoTime()
      try {
        spark.sparkContext.setJobDescription(name)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable => println(s"[extra] $name FAILED: $e"); return -1.0 }
      finally spark.sparkContext.setJobDescription(null)
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShims.drainListenerBus(spark.sparkContext)
      val (t1t, t1c, t1g) = trace.snapshot
      if (report) {
        val js = trace.order.toArray.map(_.asInstanceOf[Int])
          .flatMap(id => Option(trace.jobs.get(id))).toSeq
        val jobWall = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        val nTasks = js.map(_.tasks).sum
        println(f"[extra] $name%-22s wall=$wall%6.2f task=${t1t - t0t}%7.1f " +
          f"cpu=${t1c - t0c}%6.1f gc=${t1g - t0g}%5.1f jobs=${js.size}%3d " +
          f"tasks=$nTasks%5d jobWall=$jobWall%6.2f gap=${wall - jobWall}%6.2f")
        js.sortBy(j => -(j.end - j.start)).take(8).foreach { j =>
          println(f"[extra]   job ${j.id}%4d ${(j.end - j.start) / 1e3}%6.2f s " +
            f"tasks=${j.tasks}%5d ${j.desc.take(80)}")
        }
      }
      wall
    }

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
    val results = qs.map { case (name, fn) =>
      // plan capture (cheap, driver-only)
      try {
        val planTxt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(planDir.resolve(s"${name}_$tag.txt"), planTxt)
      } catch { case e: Throwable => println(s"[extra] $name explain failed: $e") }
      val w1 = leg(name, fn, report = false)
      val w2 = leg(name, fn, report = true)
      val best = Seq(w1, w2).filter(_ >= 0)
      println(f"[extra] $name%-22s legs=[$w1%.2f, $w2%.2f]")
      name -> (if (best.nonEmpty) best.min else -1.0)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"[extra] TOTAL min-of-2 sum = $total%.2f s over ${results.size} queries")
    results.sortBy(-_._2).foreach { case (n, w) => println(f"[extra]   $n%-22s $w%7.3f") }
    spark.stop()
  }
}
