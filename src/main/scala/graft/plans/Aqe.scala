package graft.plans

import org.apache.spark.sql.SparkSession

/** Scoped adaptive-query-execution toggle for the superstep operators.
  *
  * AQE re-plans at every shuffle boundary by materializing a query stage,
  * collecting runtime stats, and re-optimizing on the driver. For one-shot
  * analytical queries that is a win (skew-join splitting, partition
  * coalescing) and stays ON. For the iterative operators it is pure driver
  * latency: every superstep is one small fixed-shape job whose plan never
  * benefits from runtime re-planning, and the per-stage materialization
  * barrier lands directly on the per-step serial floor that limits scaling
  * efficiency at sandbox sizes (BASELINE.md). Measured on the 15.3M-edge
  * bench graph (adjacent A/B, round 4): AQE off cuts the SCC serial floor
  * 15.1 s → 11.7 s @32 cores and 14.1 s → 9.4 s @8 (−28 stages/run), wall
  * −5.5% @32 / −8.4% @8, identical task-seconds — the savings are entirely
  * scheduling/planning latency, exactly the term the scaling rule's
  * two-parallelism criterion punishes.
  *
  * Scoped, not session-global: the config is read at planning time, every
  * frame an operator returns is already checkpointed/materialized, so later
  * evaluation under the caller's restored setting only plans trivial
  * unions/filters over cached RDDs.
  */
object Aqe {
  private val Key = "spark.sql.adaptive.enabled"

  /** Run `f` with AQE disabled, restoring the previous session setting. */
  def off[T](spark: SparkSession)(f: => T): T = {
    val prev = spark.conf.get(Key, "true")
    spark.conf.set(Key, "false")
    try f
    finally spark.conf.set(Key, prev)
  }

  /** Deferred variant for operators that learn their input size mid-flight
    * (Scc's edge count materializes with its first action): `f` receives a
    * disable thunk to call once the size is known; the previous setting is
    * restored on exit either way — including exceptions, so a failed run
    * can never leak AQE-off into a shared session.
    */
  def scoped[T](spark: SparkSession)(f: (() => Unit) => T): T = {
    val prev = spark.conf.get(Key, "true")
    try f(() => spark.conf.set(Key, "false"))
    finally spark.conf.set(Key, prev)
  }
}
