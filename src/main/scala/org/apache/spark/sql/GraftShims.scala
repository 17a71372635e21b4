package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.unsafe.Platform

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
  *
  * Round-6 storage change (guide §5 — memory pressure is the measured
  * limiter at bench scale): checkpointed partitions are cached as PACKED
  * byte batches ([[PackedRowBatch]]) — each batch one contiguous byte
  * array of concatenated UnsafeRows plus offset/length arrays, rows
  * re-materialized by `pointTo` into one reused UnsafeRow per scan. The
  * previous per-row `copy()` cache kept two heap OBJECTS per row (the
  * UnsafeRow + its byte[]) alive for the checkpoint's lifetime: at the
  * 61M-edge SCC point that is ~20M rows × 2 objects per superstep state,
  * and GC was 34% of executor task time. Packing stores the same bytes in
  * O(1) objects per batch — no serializer, no compression, just memcpy in
  * and pointer-bumping out. (The earlier MEMORY_AND_DISK_SER A/B paid
  * JavaSerializer CPU per row and measured 25% slower; this path has no
  * per-row serialization cost.) Escape hatch: GRAFT_CKPT_PACK=0 restores
  * the per-row copy cache.
  */
object GraftShims {

  /** Storage level for superstep checkpoint blocks (see the object doc;
    * GRAFT_CKPT_SER=1 additionally stores the legacy row cache serialized —
    * kept as a diagnostic for memory-constrained deployments).
    */
  private val ckptLevel =
    if (sys.env.get("GRAFT_CKPT_SER").contains("1"))
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private val packEnabled = !sys.env.get("GRAFT_CKPT_PACK").contains("0")

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4 made
    * Column node-based; the classic converter lives in a private[sql]
    * package, re-exposed here for graft's native expressions).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[column]]. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The shared checkpoint core: materialize `df` once (cache + truncate
    * lineage), calling `observe` exactly once per row DURING the
    * materialization pass (ResultStage accumulator semantics — see the
    * exactness note below), and wrap the cached rows in a fresh LogicalRDD
    * carrying the physical plan's output partitioning/ordering but default
    * stats. Returns (frame, persisted-rdd-handle, rowCount).
    *
    * EXACTNESS of observe-fed accumulators: the observe call sits in the
    * final map of the one count() below, i.e. inside that job's ResultStage
    * tasks. Spark's scheduler applies a ResultTask's accumulator updates
    * only on the FIRST successful completion of each partition (retries of
    * failed attempts are discarded — countFailedValues=false — and a
    * speculative duplicate's updates are ignored because the partition is
    * already finished), so observe-fed counts are exactly-once per
    * partition even under task retry, stage retry, and speculation — unlike
    * an accumulator in a ShuffleMapStage, where re-executed map tasks DO
    * double-count. The other recompute path (a later job re-running this
    * map after cache eviction) is closed by the localCheckpoint: lineage is
    * truncated, so Spark reloads blocks or fails — never re-executes.
    * Callers may therefore use ridden counts as exact tallies (Scc's
    * fragment-exactness requires do), not just convergence signals.
    */
  private def ckptImpl(
      df: DataFrame, observe: InternalRow => Unit): (DataFrame, RDD[_], Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val (handle: RDD[_], rows: RDD[InternalRow], n: Long) =
      if (packEnabled) {
        val rowCount = session.sparkContext.longAccumulator("graft.ckpt.rows")
        val nf = qe.analyzed.output.size
        val packed = qe.toRdd.mapPartitions { it =>
          PackedRowBatch.pack(it, nf, r => { observe(r); rowCount.add(1L) })
        }
        packed.persist(ckptLevel)
        packed.localCheckpoint()
        packed.count()
        val rowsRdd = packed.mapPartitions(_.flatMap(_.rowIterator),
          preservesPartitioning = true)
        (packed, rowsRdd, rowCount.value.longValue)
      } else {
        // legacy per-row copy cache (GRAFT_CKPT_PACK=0): toRdd rows are
        // reused per-partition buffers; copy before caching.
        val rdd = qe.toRdd.map { r => observe(r); r.copy() }
        rdd.persist(ckptLevel)
        rdd.localCheckpoint()
        val n = rdd.count()
        (rdd, rdd, n)
      }
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
      physical.output, rows, physical.outputPartitioning, physical.outputOrdering)(session)
    (classic.Dataset.ofRows(session, logical), handle, n)
  }

  /** Eagerly materialize `df` into a cached, lineage-truncated RDD and wrap
    * it in a fresh DataFrame with the same schema and output partitioning
    * but default (not inherited) stats. Returns the DataFrame, the backing
    * RDD handle so callers can `unpersist` once superseded, and the exact
    * materialized row count.
    */
  def checkpointFresh(df: DataFrame): (DataFrame, RDD[_], Long) =
    ckptImpl(df, _ => ())

  /** [[checkpointFresh]] that additionally counts rows whose boolean column
    * `flagCol` is true, DURING the materialization pass (via accumulator) —
    * an iterative algorithm's convergence check then costs zero extra jobs
    * instead of one count-job per superstep. Returns
    * (frame, rdd, totalRows, flaggedRows).
    */
  def checkpointFreshFlagged(
      df: DataFrame, flagCol: String): (DataFrame, RDD[_], Long, Long) = {
    val idx = df.schema.fieldIndex(flagCol)
    flaggedImpl(df, flagCol, r => !r.isNullAt(idx) && r.getBoolean(idx))
  }

  /** [[checkpointFreshFlagged]] over a bit-packed IntegerType status column:
    * a row counts as flagged when `(value & mask) != 0`. Lets an iterative
    * state pack several boolean flags into one 8-byte UnsafeRow slot and
    * still ride the convergence count on the materialization pass.
    */
  def checkpointFreshFlaggedMasked(
      df: DataFrame, flagCol: String, mask: Int): (DataFrame, RDD[_], Long, Long) = {
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
    * (see [[ckptImpl]]), so counts/sums are exact too; maxes are
    * additionally idempotent by construction. Callers here still use the
    * stats only to pick strategies (thresholds, logging) — results never
    * depend on them.
    * Returns (frame, rdd, totalRows, flaggedRows, sums, maxes).
    */
  def checkpointFreshFlaggedWithLongStats(
      df: DataFrame, flagCol: String, statCols: Seq[String]):
      (DataFrame, RDD[_], Long, Long, Array[Long], Array[Long]) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
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
    val (out, rdd, n) = ckptImpl(df, { r =>
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
    })
    (out, rdd, n, flagAcc.value,
      sumAccs.map(_.value.longValue),
      maxAccs.map(a => math.max(0L, a.value.longValue)))
  }

  /** Xor-of-longs accumulator: order-free content signature. Exactly-once
    * under retry/speculation by the same ResultStage argument as the sum
    * accumulators (see [[ckptImpl]]); callers additionally treat the
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
      df: DataFrame, cols: Seq[String]): (DataFrame, RDD[_], Long, Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val idx = cols.map(df.schema.fieldIndex).toArray
    idx.foreach { i =>
      require(df.schema(i).dataType == org.apache.spark.sql.types.LongType,
        s"signature column ${df.schema(i).name} must be LongType")
    }
    val acc = new XorAccumulator
    session.sparkContext.register(acc, s"graft.sig.${cols.mkString(",")}")
    val (out, rdd, n) = ckptImpl(df, { r =>
      var h = 42L
      var i = 0
      while (i < idx.length) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(r.getLong(idx(i)), h)
        i += 1
      }
      acc.add(h)
    })
    (out, rdd, n, acc.value.longValue)
  }

  private def flaggedImpl(
      df: DataFrame, flagCol: String,
      flagged: InternalRow => Boolean): (DataFrame, RDD[_], Long, Long) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val acc = session.sparkContext.longAccumulator(s"graft.flagged.$flagCol")
    val (out, rdd, n) = ckptImpl(df, r => if (flagged(r)) acc.add(1L))
    (out, rdd, n, acc.value)
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
}

/** One cached checkpoint batch: up to [[PackedRowBatch.targetBytes]] of
  * concatenated UnsafeRow bytes in ONE array, plus per-row offset/length.
  * Rows re-materialize on scan via `pointTo` into a single reused UnsafeRow
  * (downstream Spark operators treat incoming InternalRows as reusable
  * buffers — the LogicalRDD scan's UnsafeProjection copies values out per
  * row, the same contract as rows read from shuffle or cache). The rare
  * non-UnsafeRow input row (no whole-stage-codegen top operator) is kept as
  * a copied object with a negative length marking its slot, preserving row
  * order exactly.
  */
private[sql] final class PackedRowBatch(
    val numFields: Int,
    val data: Array[Byte],
    val offsets: Array[Int],
    val lens: Array[Int],
    val others: Array[InternalRow]) extends Serializable {

  def rowIterator: Iterator[InternalRow] = new scala.collection.AbstractIterator[InternalRow] {
    private var i = 0
    private val row = new UnsafeRow(numFields)
    override def hasNext: Boolean = i < lens.length
    override def next(): InternalRow = {
      val l = lens(i)
      val out =
        if (l >= 0) {
          row.pointTo(data, Platform.BYTE_ARRAY_OFFSET + offsets(i), l)
          row
        } else others(-l - 1)
      i += 1
      out
    }
  }
}

private[sql] object PackedRowBatch {
  /** Per-batch data cap: bounds transient build memory and keeps any
    * disk-spill unit reasonable; multiple batches per partition are fine.
    */
  val targetBytes: Int = 32 << 20

  /** Pack a partition's rows into batches, calling `observe` exactly once
    * per row as it streams by.
    */
  def pack(
      it: Iterator[InternalRow], numFields: Int,
      observe: InternalRow => Unit): Iterator[PackedRowBatch] =
    new scala.collection.AbstractIterator[PackedRowBatch] {
      override def hasNext: Boolean = it.hasNext
      override def next(): PackedRowBatch = {
        var data = new Array[Byte](64 << 10)
        var used = 0
        val offsets = new scala.collection.mutable.ArrayBuilder.ofInt
        val lens = new scala.collection.mutable.ArrayBuilder.ofInt
        val others = scala.collection.mutable.ArrayBuffer[InternalRow]()
        var full = false
        while (it.hasNext && !full) {
          val r = it.next()
          observe(r)
          r match {
            case u: UnsafeRow =>
              val sz = u.getSizeInBytes
              if (used + sz > data.length) {
                var cap = data.length.toLong
                while (cap < used + sz) cap *= 2
                data = java.util.Arrays.copyOf(data, math.min(cap, Int.MaxValue - 8).toInt)
              }
              Platform.copyMemory(u.getBaseObject, u.getBaseOffset,
                data, Platform.BYTE_ARRAY_OFFSET + used, sz.toLong)
              offsets += used
              lens += sz
              used += sz
            case other =>
              others += other.copy()
              offsets += 0
              lens += -others.size // -(index+1)
          }
          if (used >= targetBytes) full = true
        }
        new PackedRowBatch(numFields,
          if (used == data.length) data else java.util.Arrays.copyOf(data, used),
          offsets.result(), lens.result(), others.toArray)
      }
    }
}
