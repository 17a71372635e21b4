package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed synthetic graph generator.
  *
  * Mirrors the construction of the reference's generator
  * (`/root/reference/gen/generate.py:39-41,85-114`): a union of directed
  * cycles of pseudo-random lengths, plus random extra arcs that merge some
  * cycles into larger SCCs, plus vertices that belong to no cycle. The U
  * subset is "all members of ~half the cycles ∪ a random 1/20 of vertices"
  * (generate.py:146-147).
  *
  * Unlike the reference (a driver-side Python loop), generation here is pure
  * column algebra over `spark.range(n)` — every vertex/edge is a function of
  * its index through `xxhash64`, so the same spec yields the same graph at
  * any parallelism and any scale, with no driver materialization. At 10^12
  * rows this is just a bigger `range`.
  *
  * Layout: cycle `c` owns the id block `[c*B, (c+1)*B)` where `B = maxCycleLen`.
  * Within the block, positions `0 until len(c)` form the directed cycle
  * (`len(c) = 2 + hash(c) mod (B-1)`); positions `len(c) until B` are
  * cycle-free filler vertices (the reference's "extra nodes"). This keeps
  * vertex→cycle assignment O(1) per row instead of needing a prefix-sum over
  * random lengths.
  */
final case class GraphSpec(
    numCycles: Long,
    maxCycleLen: Int = 16,
    extraArcsPerVertex: Double = 0.5,
    seed: Long = 42L) {
  require(maxCycleLen >= 3, "need room for cycles of length >= 2 plus filler")
  def blockSize: Int = maxCycleLen
  def numVertices: Long = numCycles * blockSize
  def numExtraArcs: Long = (numVertices * extraArcsPerVertex).toLong
}

/** Parameters of the reference's mid_tests generator (generate.py:14-36),
  * defaults = the published constants. The reference derives
  * lenLo = numCycles/60 and lenHi = 2·numCycles/60; pass them explicitly so
  * fixture size and cycle length decouple.
  */
final case class MidTestSpec(
    numCycles: Long,
    lenLo: Int,
    lenHi: Int,
    extraNodesFrac: Double = 0.2,
    arcsPerNode: Double = 0.9999,
    arcsToRemovePerCycle: Int = 18,
    seed: Long = 24122022L) {
  require(lenLo >= 2 && lenHi >= lenLo)
}

object GraphGen {

  /** Range split count sized to the row count (~1 split per 32k rows,
    * clamped to [1, defaultParallelism]). `spark.range(n)` always fans out
    * to defaultParallelism tasks; for tiny synthetic tables every one of
    * those tasks pays Spark's fixed per-task costs — a ~page-sized
    * RowBasedKeyValueBatch allocation in each hash aggregate and a
    * file-create+commit per shuffle map task — which dominated the
    * generator-backed queries (thread-dump evidence, OPTIMIZATION_r06.md).
    * Row values are a pure function of `id`, so the split count never
    * changes results.
    */
  private[sources] def slicesFor(spark: SparkSession, n: Long): Int =
    math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 32768L + 1L)).toInt

  /** The c/pos/len cycle-assignment columns shared by [[edges]] and
    * [[vertices]] — ONE copy of the algebra so the two can never silently
    * diverge, and in the LONG domain end-to-end: `id div b` is exact
    * integer division at any id, where the old double `/` (Spark's `/` on
    * longs is floating-point) rounds ids past ~2^52/b into the NEIGHBORING
    * cycle's block, making edges and vertices disagree on membership.
    */
  private def withCycleCols(
      df: DataFrame, spec: GraphSpec): DataFrame = {
    val b = lit(spec.blockSize.toLong)
    df.withColumn("c", expr(s"id div ${spec.blockSize}"))
      .withColumn("pos", col("id") % b)
      .withColumn("len", lit(2L) + pmod(xxhash64(lit(spec.seed), col("c")), b - 1))
  }

  /** Distinct directed edges (src: long, dst: long), no self-loops. */
  def edges(spark: SparkSession, spec: GraphSpec): DataFrame = {
    val b = lit(spec.blockSize.toLong)
    val n = spec.numVertices

    val cycleEdges = withCycleCols(
      spark.range(0, n, 1, slicesFor(spark, n)).toDF(), spec)
      .filter(col("pos") < col("len"))
      .select(
        col("id").as("src"),
        when(col("pos") + 1 < col("len"), col("id") + 1)
          .otherwise(col("c") * b)
          .as("dst"))

    val extraArcs = spark
      .range(0, spec.numExtraArcs, 1, slicesFor(spark, spec.numExtraArcs))
      .select(
        pmod(xxhash64(lit(spec.seed + 1), col("id")), lit(n)).as("src"),
        pmod(xxhash64(lit(spec.seed + 2), col("id")), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))

    cycleEdges.unionByName(extraArcs).distinct()
  }

  /** The reference's mid_tests construction (generate.py:76-153), ported
    * parameter-for-parameter as distributed column algebra: `numCycles`
    * directed cycles with pseudo-random lengths in [lenLo, lenHi] laid out
    * at cumulative offsets (generate.py:39-41,96-99), plus
    * `extraNodesFrac`·n isolated vertices (l.101-102), plus
    * ⌊arcsPerNode·n⌋ uniform random arcs (l.108-110, RANDOM_ARCS_TO_ADD),
    * minus `arcsToRemovePerCycle`·numCycles pseudo-randomly chosen arcs
    * (l.116-117, N_ARCS_TO_REMOVE). Python's RNG is replaced by xxhash64
    * streams — the construction (not the byte-identical graph) is the
    * parity target; correctness is checked against the in-test Tarjan
    * oracle, like the reference checks its own generator with networkx
    * (generate.py:131-136).
    *
    * Returns (edges, numVertices). The cumulative-offset prefix sum runs as
    * a window over the cycle table (numCycles rows, not numVertices) — at
    * 10^9+ cycles switch to a two-level scan; fixture generation never
    * needs that.
    */
  def midTestEdges(spark: SparkSession, spec: MidTestSpec): (DataFrame, Long) = {
    val lens = spark.range(spec.numCycles)
      .select(col("id").as("c"),
        (lit(spec.lenLo.toLong) +
          pmod(xxhash64(lit(spec.seed), col("id")), lit((spec.lenHi - spec.lenLo + 1).toLong)))
          .as("len"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cycles = lens.withColumn("offset", coalesce(sum("len").over(w), lit(0L)))

    val n0 = lens.agg(sum("len")).head().getLong(0)
    val n = n0 + (n0 * spec.extraNodesFrac).toLong

    val cycleEdges = cycles
      .select(col("offset"), col("len"),
        explode(sequence(lit(0L), col("len") - 1)).as("pos"))
      .select(
        (col("offset") + col("pos")).as("src"),
        (col("offset") + pmod(col("pos") + 1, col("len"))).as("dst"))

    val numRandomArcs = (n * spec.arcsPerNode).toLong
    val randomArcs = spark.range(numRandomArcs)
      .select(
        pmod(xxhash64(lit(spec.seed + 1), col("id")), lit(n)).as("src"),
        pmod(xxhash64(lit(spec.seed + 2), col("id")), lit(n)).as("dst"))

    val all = cycleEdges.unionByName(randomArcs)
      .filter(col("src") =!= col("dst"))
      .distinct()
    // remove K pseudo-random arcs: the K smallest under an order-free hash.
    // Computed in the LONG domain — the old .toInt on the product wrapped
    // negative past ~120M cycles and limit() throws on a negative argument
    val kL = spec.arcsToRemovePerCycle.toLong * spec.numCycles
    require(kL >= 0 && kL <= Int.MaxValue,
      s"arcsToRemovePerCycle*numCycles = $kL exceeds limit()'s Int range")
    val k = kL.toInt
    val removed = all
      .orderBy(xxhash64(lit(spec.seed + 3), col("src"), col("dst")))
      .limit(k)
    (all.join(removed, Seq("src", "dst"), "left_anti"), n)
  }

  /** Mid-test vertex table: isU = random 1/20 of vertices (generate.py:147
    * RATIO_U_NODES_TO_TOTAL_NODES; the SCC-seeded half of the reference's U
    * needs the answer, so tests add it from the oracle when required). */
  def midTestVertices(spark: SparkSession, spec: MidTestSpec, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      (pmod(xxhash64(lit(spec.seed + 4), col("id")), lit(20)) === 0).as("isU"))

  /** Vertex table (id: long, isU: boolean). */
  def vertices(spark: SparkSession, spec: GraphSpec): DataFrame = {
    withCycleCols(
      spark.range(0, spec.numVertices, 1, slicesFor(spark, spec.numVertices)).toDF(), spec)
      .select(
        col("id"),
        ((col("pos") < col("len") && pmod(xxhash64(lit(spec.seed + 3), col("c")), lit(2)) === 0) ||
          pmod(xxhash64(lit(spec.seed + 4), col("id")), lit(20)) === 0).as("isU"))
  }
}
