package graft

import graft.operators.Scc
import graft.sources.{GraphGen, GraphSpec}

/** Scratch sizing probe for the bench graph (not part of the contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val numCycles = args(1).toLong
    val arcs = if (args.length > 2 && args(2) != "pr") args(2).toDouble else 1.2
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    val spec = GraphSpec(numCycles = numCycles, maxCycleLen = 6,
      extraArcsPerVertex = arcs, seed = 42L)
    // serialized-share instrumentation: total executor task time and stage
    // count over the timed region — (wall − taskTime/cores) ≈ the fixed
    // driver/scheduling term the scaling accounting in BASELINE.md names
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    // per-callsite attribution: stage name carries the materializing call
    val byName = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        taskMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000)
        gcMs.addAndGet(m.jvmGCTime)
        stages.incrementAndGet()
        val key = sc.stageInfo.name.takeWhile(_ != '+').trim
        byName.computeIfAbsent(key, _ => Array(0L, 0L, 0L, 0L))
          .synchronized {
            val a = byName.get(key)
            a(0) += 1; a(1) += m.executorRunTime
            a(2) += m.executorCpuTime / 1000000; a(3) += m.jvmGCTime
          }
      }
    })
    val edges = GraphGen.edges(spark, spec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = edges.count()
    // reset the per-callsite table together with the scalar counters, or
    // the printed attribution includes graph-gen stages outside the timed
    // region and disagrees with the aggregates beside it
    taskMs.set(0); cpuMs.set(0); gcMs.set(0); stages.set(0); byName.clear()
    graft.Log.v("probe: timed region start")
    val t0 = System.nanoTime()
    if (args.length > 2 && args(2) == "pr") {
      val run1 = graft.operators.PageRank.run(
        spark, edges, GraphGen.vertices(spark, spec), tol = 0.0, maxIter = 10)
      val ranks = run1.ranks
      val cnt = ranks.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PR cores=$cores cycles=$numCycles edges=$m rows=$cnt sec=$sec%.1f iters_per_sec=${10 / sec}%.3f")
    } else {
      val run2 = Scc.components(spark, edges, GraphGen.vertices(spark, spec),
        edgesWithinVertices = true)
      val comp = run2.components
      val metrics = run2.metrics
      val cnt = comp.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val bfsTotal = metrics.map(_.bfsSteps).sum
      println(f"cores=$cores cycles=$numCycles edges=$m rows=$cnt sec=$sec%.1f tput=${m / sec}%.0f e/s rounds=${metrics.size} bfsSteps=$bfsTotal stages=${stages.get} taskSec=${taskMs.get / 1e3}%.1f cpuSec=${cpuMs.get / 1e3}%.1f gcSec=${gcMs.get / 1e3}%.1f parShare=${taskMs.get / 1e3 / cores / sec}%.2f cpuShare=${cpuMs.get / 1e3 / cores / sec}%.2f")
      import scala.jdk.CollectionConverters._
      byName.asScala.toSeq.sortBy(-_._2(1)).take(12).foreach { case (k, a) =>
        println(f"  stage ${a(0)}%3d× run=${a(1) / 1e3}%7.1fs cpu=${a(2) / 1e3}%7.1fs gc=${a(3) / 1e3}%6.1fs  $k")
      }
    }
    spark.stop()
  }
}
