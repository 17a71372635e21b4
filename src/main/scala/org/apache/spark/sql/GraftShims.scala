package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD

/** Spark-internal access shim (hence the package) for one operation the
  * public Dataset API cannot express: an eager lineage-cutting checkpoint
  * that preserves the physical OUTPUT PARTITIONING but does NOT carry the
  * source plan's estimated statistics forward.
  *
  * Why not `Dataset.localCheckpoint`: it preserves the optimized plan's
  * stats on the resulting `LogicalRDD` (`originStats`). In an iterative
  * superstep, join-size estimation multiplies those stats every iteration —
  * and a self-join squares them — so the estimated `sizeInBytes` BigInt
  * doubles its bit length per superstep and Catalyst's
  * `SizeInBytesOnlyStatsPlanVisitor` ends up spending minutes per step in
  * `BigInteger.multiply` (observed via jstack: ~100 s/step by superstep 20
  * on a 50k-row state). Rebuilding from the materialized `InternalRow` RDD
  * resets the leaf to default stats; AQE re-plans join strategies from
  * runtime shuffle sizes anyway.
  *
  * Why not `createDataFrame(rdd)`: it loses `outputPartitioning`, so every
  * superstep re-shuffles the full state even when the step's joins are on
  * the same key the previous step hashed by. Passing the executed plan's
  * partitioning through the `LogicalRDD` leaf lets Catalyst prove
  * co-partitioning and skip the exchange — at 10^8-row states that is the
  * difference between O(frontier) and O(state) shuffle bytes per step.
  */
object GraftShims {

  /** Storage level for superstep checkpoint blocks. Serialized storage
    * (GRAFT_CKPT_SER=1) keeps each cached partition as one buffer instead
    * of millions of resident UnsafeRow objects, trading per-scan
    * deserialization for old-gen GC pressure. A/B at the 15.3M-edge bench
    * point (local[32]): serialized measured 25% SLOWER end-to-end —
    * checkpoint-stage CPU doubled (1.0k→2.2k cpu-sec) while GC fell only
    * ~250 task-sec, so the deserialized default stands; the knob stays as
    * a diagnostic for memory-constrained deployments where cache spill,
    * not CPU, binds.
    */
  private val ckptLevel =
    if (sys.env.get("GRAFT_CKPT_SER").contains("1"))
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4 made
    * Column node-based; the classic converter lives in a private[sql]
    * package, re-exposed here for graft's native expressions).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[column]]. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** [[checkpointFresh]] that additionally counts rows whose boolean column
    * `flagCol` is true, DURING the materialization pass (via accumulator) —
    * an iterative algorithm's convergence check then costs zero extra jobs
    * instead of one count-job per superstep. Returns
    * (frame, rdd, totalRows, flaggedRows).
    */
  def checkpointFreshFlagged(
      df: DataFrame, flagCol: String): (DataFrame, RDD[InternalRow], Long, Long) = {
    val idx = df.schema.fieldIndex(flagCol)
    flaggedImpl(df, flagCol, r => !r.isNullAt(idx) && r.getBoolean(idx))
  }

  /** [[checkpointFreshFlagged]] over a bit-packed IntegerType status column:
    * a row counts as flagged when `(value & mask) != 0`. Lets an iterative
    * state pack several boolean flags into one 8-byte UnsafeRow slot and
    * still ride the convergence count on the materialization pass.
    */
  def checkpointFreshFlaggedMasked(
      df: DataFrame, flagCol: String, mask: Int): (DataFrame, RDD[InternalRow], Long, Long) = {
    val idx = df.schema.fieldIndex(flagCol)
    flaggedImpl(df, flagCol, r => !r.isNullAt(idx) && (r.getInt(idx) & mask) != 0)
  }

  /** Max-of-longs accumulator (Spark ships none): retry-safe by idempotence
    * of max — unlike the sum accumulators, a replayed task cannot change
    * the result.
    */
  private final class MaxAccumulator
      extends org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long] {
    private var _max = Long.MinValue
    override def isZero: Boolean = _max == Long.MinValue
    override def copy(): MaxAccumulator = {
      val a = new MaxAccumulator; a._max = _max; a
    }
    override def reset(): Unit = _max = Long.MinValue
    override def add(v: java.lang.Long): Unit = _max = math.max(_max, v)
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long]): Unit =
      _max = math.max(_max, other.value)
    override def value: java.lang.Long = _max
  }

  /** [[checkpointFreshFlagged]] that ADDITIONALLY rides per-column sum and
    * max over the given LongType columns on the same materialization pass —
    * one driver action yields the frame, its row/flagged counts, and the
    * aggregate stats an algorithm needs to pick its strategy (e.g. SCC's
    * edge total and full-graph max degrees, previously a separate agg job
    * on every call). Null column values count as 0 toward the sum and are
    * skipped for the max. Same exactness argument as the flag accumulator
    * (see [[flaggedImpl]]: ResultStage updates apply once per partition,
    * and the localCheckpoint forbids later recompute), so counts/sums are
    * exact too; maxes are additionally idempotent by construction. Callers
    * here still use the stats only to pick strategies (thresholds,
    * logging) — results never depend on them.
    * Returns (frame, rdd, totalRows, flaggedRows, sums, maxes).
    */
  def checkpointFreshFlaggedWithLongStats(
      df: DataFrame, flagCol: String, statCols: Seq[String]):
      (DataFrame, RDD[InternalRow], Long, Long, Array[Long], Array[Long]) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val flagIdx = df.schema.fieldIndex(flagCol)
    val statIdx = statCols.map(df.schema.fieldIndex).toArray
    statIdx.foreach { i =>
      require(df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"stat column ${df.schema(i).name} must be LongType")
    }
    val flagAcc = session.sparkContext.longAccumulator(s"graft.flagged.$flagCol")
    val sumAccs = statCols.map(c =>
      session.sparkContext.longAccumulator(s"graft.sum.$c")).toArray
    val maxAccs = statCols.map { c =>
      val a = new MaxAccumulator
      session.sparkContext.register(a, s"graft.max.$c")
      a
    }.toArray
    val rdd = qe.toRdd.map { r =>
      if (!r.isNullAt(flagIdx) && r.getBoolean(flagIdx)) flagAcc.add(1L)
      var i = 0
      while (i < statIdx.length) {
        if (!r.isNullAt(statIdx(i))) {
          val v = r.getLong(statIdx(i))
          sumAccs(i).add(v)
          maxAccs(i).add(v)
        }
        i += 1
      }
      r.copy()
    }
    rdd.persist(ckptLevel)
    rdd.localCheckpoint()
    val n = rdd.count()
    val physical = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan
      case p => p
    }
    val logical = LogicalRDD(
      physical.output, rdd, physical.outputPartitioning, physical.outputOrdering)(session)
    (classic.Dataset.ofRows(session, logical), rdd, n, flagAcc.value,
      sumAccs.map(_.value.longValue),
      maxAccs.map(a => math.max(0L, a.value.longValue)))
  }

  /** Xor-of-longs accumulator: order-free content signature. Exactly-once
    * under retry/speculation by the same ResultStage argument as the sum
    * accumulators (see [[flaggedImpl]]); callers additionally treat the
    * value only as a CONVERGENCE SIGNAL confirmed by an exact set compare
    * on first stability, so results never depend on it.
    */
  private final class XorAccumulator
      extends org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long] {
    private var _x = 0L
    private var _any = false
    override def isZero: Boolean = !_any
    override def copy(): XorAccumulator = {
      val a = new XorAccumulator; a._x = _x; a._any = _any; a
    }
    override def reset(): Unit = { _x = 0L; _any = false }
    override def add(v: java.lang.Long): Unit = { _x ^= v; _any = true }
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[java.lang.Long, java.lang.Long]): Unit = {
      _x ^= other.value; _any = true
    }
    override def value: java.lang.Long = _x
  }

  /** [[checkpointFresh]] that ADDITIONALLY rides a 64-bit content signature
    * of the given LongType columns on the materialization pass: xor over
    * rows of the seed-42 XXH64 fold of the column values (the same fold as
    * `xxhash64(cols…)`). An iterative algorithm whose convergence test is
    * "did the state's content change" (WCC's link set) then needs ZERO
    * extra jobs per superstep — previously a separate full-scan aggregate
    * job per round. Returns (frame, rdd, rows, signature).
    */
  def checkpointFreshHashSig(
      df: DataFrame, cols: Seq[String]): (DataFrame, RDD[InternalRow], Long, Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val idx = cols.map(df.schema.fieldIndex).toArray
    idx.foreach { i =>
      require(df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"signature column ${df.schema(i).name} must be LongType")
    }
    val acc = new XorAccumulator
    session.sparkContext.register(acc, s"graft.sig.${cols.mkString(",")}")
    val rdd = qe.toRdd.map { r =>
      var h = 42L
      var i = 0
      while (i < idx.length) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(r.getLong(idx(i)), h)
        i += 1
      }
      acc.add(h)
      r.copy()
    }
    rdd.persist(ckptLevel)
    rdd.localCheckpoint()
    val n = rdd.count()
    val physical = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan
      case p => p
    }
    val logical = LogicalRDD(
      physical.output, rdd, physical.outputPartitioning, physical.outputOrdering)(session)
    (classic.Dataset.ofRows(session, logical), rdd, n, acc.value.longValue)
  }

  private def flaggedImpl(
      df: DataFrame, flagCol: String,
      flagged: InternalRow => Boolean): (DataFrame, RDD[InternalRow], Long, Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val acc = session.sparkContext.longAccumulator(s"graft.flagged.$flagCol")
    // EXACTNESS: the increment sits in the FINAL map of the one count()
    // below, i.e. inside that job's ResultStage tasks. Spark's scheduler
    // applies a ResultTask's accumulator updates only on the FIRST
    // successful completion of each partition (retries of failed attempts
    // are discarded — countFailedValues=false — and a speculative
    // duplicate's updates are ignored because the partition is already
    // finished), so the flagged count is exactly-once per partition even
    // under task retry, stage retry, and speculation — unlike an
    // accumulator in a ShuffleMapStage, where re-executed map tasks DO
    // double-count. The other recompute path (a later job re-running this
    // map after cache eviction) is closed by the localCheckpoint: lineage
    // is truncated, so Spark reloads blocks or fails — never re-executes.
    // Callers may therefore use the flagged count as an exact tally (Scc's
    // fragment-exactness requires do), not just a convergence signal.
    // Exact per-step counts via a second aggregation would cost a second
    // job per superstep, which is the latency this shim exists to remove.
    val rdd = qe.toRdd.map { r =>
      if (flagged(r)) acc.add(1L)
      r.copy()
    }
    rdd.persist(ckptLevel)
    rdd.localCheckpoint()
    val n = rdd.count()
    val physical = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan
      case p => p
    }
    val logical = LogicalRDD(
      physical.output, rdd, physical.outputPartitioning, physical.outputOrdering)(session)
    (classic.Dataset.ofRows(session, logical), rdd, n, acc.value)
  }

  /** Drain the listener bus so a task-metrics snapshot taken right after a
    * timed region includes every stage that completed inside it — stage
    * events post asynchronously and can otherwise land after the snapshot
    * (the bench's per-leg taskSec/cpuSec/gcSec attribution relies on this).
    * Best-effort: a timeout leaves the snapshot slightly short, never wrong
    * in sign.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: Throwable => () }

  /** Eagerly materialize `df` into a cached, lineage-truncated RDD and wrap
    * it in a fresh DataFrame with the same schema and output partitioning
    * but default (not inherited) stats. Returns the DataFrame, the backing
    * RDD handle so callers can `unpersist` once superseded, and the exact
    * materialized row count.
    */
  def checkpointFresh(df: DataFrame): (DataFrame, RDD[InternalRow], Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    // toRdd rows are reused per-partition buffers; copy before caching.
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(ckptLevel)
    rdd.localCheckpoint() // mark RDD lineage truncation
    val n = rdd.count()   // materialize now (finalizes the AQE plan too)
    // AdaptiveSparkPlanExec reports UnknownPartitioning at the top even
    // after finalization — unwrap to the final physical plan or the
    // partitioning is silently lost and every downstream same-key join
    // re-exchanges the state (caught by PlanSpec).
    val physical = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan
      case p => p
    }
    val logical = LogicalRDD(
      physical.output, rdd, physical.outputPartitioning, physical.outputOrdering)(session)
    (classic.Dataset.ofRows(session, logical), rdd, n)
  }
}
