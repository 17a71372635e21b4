package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{PageRank, Scc}
import graft.sources.{GraphGen, GraphSpec}

/** Benchmark main (driver contract → BENCH_r{N}.json, one JSON line).
  *
  * Two parts, mirroring BASELINE.md's target metric:
  *   1. per-query wall times for every `SparkEntry.queries` entry on
  *      `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`;
  *   2. scaling evidence (north_rule): the same FW-BW-Trim SCC convergence
  *      and 10 PageRank iterations on the same generated link graph, run at
  *      two parallelism levels N and 4N (`local[8]` vs `local[32]`,
  *      shuffle partitions matched) — reporting edges/sec at both plus
  *      efficiency = (tput@4N / tput@N) / 4. No multi-node cluster exists
  *      in this sandbox; parallelism level stands in for executor count.
  *
  * Protocol follows the reference's harness (scc_runner.cu:29-48): one
  * discarded warmup action per session, then timed runs.
  */
object Bench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** SCC + PageRank measurement at a given core count: `repeat` timed runs
    * each, best-of taken — the reference's own warmup+repeat protocol
    * (scc_runner.cu:29-48), which is also the right answer to this
    * sandbox's noisy-neighbor variance (identical runs measured 2.4x
    * apart).
    */
  private def graphRun(cores: Int, spec: GraphSpec, repeat: Int = 2): (Double, Double, Long) = {
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val edges = GraphGen.edges(spark, spec)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val numEdges = edges.count() // warmup + materialize input (load excluded from timing)
      val vertices = GraphGen.vertices(spark, spec)

      val sccSec = (0 until repeat).map { _ =>
        timed {
          val (comp, _) = Scc.components(spark, edges, vertices)
          comp.count()
        }._2
      }.min
      val prSec = (0 until repeat).map { _ =>
        timed {
          val (ranks, _) = PageRank.run(spark, edges, vertices, tol = 0.0, maxIter = 10)
          ranks.count()
        }._2
      }.min
      edges.unpersist(false)
      (sccSec, prSec, numEdges)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)

    // ---- part 1: per-query timings on the harness tables ----
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warmup discarded
    // Timing action is a noop-format write: full evaluation of every column
    // and the final sort — `.count()` would let Catalyst prune the
    // projections of projection-only queries and time a row count instead
    // of the operators. Failed queries report -1 (never a fake wall time).
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec =
        try timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())._2
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0 }
      name -> sec
    }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- part 2: SCC/PageRank scaling at N and 4N parallelism ----
    // Graph sized to SF: sf0.1 → ~5M vertices / ~9.3M edges (4× the round-1
    // size: the scaling rule must be measured in the regime where per-step
    // WORK is visible against the fixed per-stage latency — see
    // BASELINE.md's efficiency-vs-size series; this is the largest size
    // that keeps warmup+repeat inside the bench budget). Dense random
    // shortcuts (1.2 arcs/vertex) keep the giant component's diameter
    // small — the regime of the reference's own SNAP benchmark graphs — so
    // BFS depth measures the algorithm, not an adversarial path length.
    val numCycles = math.max(2000L, (208000 * sf * 40).toLong)
    val spec = GraphSpec(numCycles = numCycles, maxCycleLen = 6,
      extraArcsPerVertex = 1.2, seed = 42L)
    val n = math.max(2, cpus / 4)
    val (sccN, prN, numEdges) = graphRun(n, spec)
    val (scc4N, pr4N, _) = graphRun(cpus, spec)

    val tputN = numEdges / sccN
    val tput4N = numEdges / scc4N
    val eff = (tput4N / tputN) / (cpus.toDouble / n)
    val prTputN = 10.0 / prN
    val prTput4N = 10.0 / pr4N
    val prEff = (prTput4N / prTputN) / (cpus.toDouble / n)

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    println(
      s"""{"metric":"scc_edges_per_sec_at_4N","value":${f"$tput4N%.1f"},"unit":"edges/sec",""" +
      s""""queries":$qs,"sf":"$sfDir","total_query_sec":${f"$total%.2f"},""" +
      s""""scaling":{"graph_edges":$numEdges,"cores_N":$n,"cores_4N":$cpus,""" +
      s""""scc_sec_N":${f"$sccN%.2f"},"scc_sec_4N":${f"$scc4N%.2f"},""" +
      s""""scc_edges_per_sec_N":${f"$tputN%.1f"},"scc_edges_per_sec_4N":${f"$tput4N%.1f"},""" +
      s""""scc_scaling_efficiency":${f"$eff%.3f"},""" +
      s""""pagerank_iters_per_sec_N":${f"$prTputN%.3f"},"pagerank_iters_per_sec_4N":${f"$prTput4N%.3f"},""" +
      s""""pagerank_scaling_efficiency":${f"$prEff%.3f"}}}""")
  }
}
