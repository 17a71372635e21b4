package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.{CheckpointArena, Superstep}

/** Strongly connected components via Forward-Backward-Trim with pivot
  * coloring — the reference's core algorithm
  * (`/root/reference/main.cpp:165-205`, `cuda/scc_operations.cu`), rebuilt
  * as declarative DataFrame supersteps.
  *
  * Differences from the reference, all deliberate (SURVEY.md §2.1, §4):
  *   - **Deterministic pivots**: the reference elects pivots by a GPU
  *     last-writer-wins race (`scc_operations.cu:163-166`); we use
  *     `min(id)` per color group, which both makes runs reproducible across
  *     cluster sizes and makes every emitted component id automatically the
  *     canonical min-member id (the pivot of a group is its min id, and the
  *     SCC found around a pivot always contains it).
  *   - **WCC pre-partitioning**: the reference starts from one global pivot,
  *     which serializes disconnected components (fine on a GPU where a round
  *     is microseconds, catastrophic when a round is a Spark job). We seed
  *     the partition map with weakly-connected-component labels so every
  *     WCC is processed concurrently from round one.
  *   - **Trim-2** (north-star extension): mutual pairs whose only live
  *     in-edges (or only live out-edges) are each other are closed as size-2
  *     SCCs before pivoting, on top of the reference's trim-1
  *     (`cuda/scc_operations.cu:89-127`).
  *   - fw and bw reachability run in the same superstep DAG — the shape the
  *     reference reaches for with two CUDA streams + a bit-OR merge in
  *     v6/v7 (`cuda/sccv6_optreach.cu:270-293`), free here.
  *
  * Semantics note (SURVEY.md §5.3): `components` decomposes whatever
  * (vertices, edges) it is given. The reference *engine* computes SCCs of
  * the U-induced subgraph while its own oracle (`misc/verify.py:42-53`)
  * computes SCCs of the full graph and filters; [[Scc.accepted]] exposes
  * both as [[SccMode]].
  */
object Scc {

  sealed trait SccMode
  /** Oracle semantics (misc/verify.py): SCCs of the full graph, then filter
    * S⊆U ∧ |S|≥2 ∧ prec(S)∩U=∅. The stated problem (README.md:49-57). */
  case object FullGraph extends SccMode
  /** Engine semantics (file2graph.cpp:96-101,162): SCCs of G[U], then kill
    * components receiving an edge from a U vertex outside them. */
  case object InducedU extends SccMode

  final case class RoundMetrics(
      round: Int, localSolved: Long, trimmed: Long, pairTrimmed: Long, bfsSteps: Int,
      sccRows: Long, liveRows: Long)

  /** Full SCC decomposition. Returns (id, comp) for every vertex, with
    * comp = min member id (canonical), plus per-round metrics.
    *
    * Hybrid execution (see [[LocalTarjan]]): every round, partitions whose
    * internal edge count fits one task (`localSolveEdgeThreshold`) are
    * finished by a per-group sequential Tarjan in a single shuffle, so only
    * partitions too big for any single machine pay the superstep loop. At
    * 100 TB that means the giant component runs distributed FW-BW while the
    * million-small-component tail costs O(1) jobs total. Set the threshold
    * to 0 to force the pure distributed path (used by tests to cover it).
    */
  def components(
      spark: SparkSession,
      edges: DataFrame,
      vertices: DataFrame,
      maxOuter: Int = 100,
      maxTrimSweeps: Int = 20,
      localSolveEdgeThreshold: Long = 250000,
      snapshotDir: Option[String] = None): (DataFrame, Vector[RoundMetrics]) = {
    import spark.implicits._
    val arena = new CheckpointArena

    val verts = vertices.select("id")
    // Only edges internal to the vertex set matter for SCCs. Persist BOTH
    // hash-partitionings (SURVEY.md §7.1): frontier/degree joins on `src`
    // and on `dst` then reuse an existing exchange instead of reshuffling
    // the edge table every superstep — with the partitioning-preserving
    // checkpoint (GraftShims) the per-step shuffle is O(frontier), not
    // O(edges + state).
    val eClean = edges.select("src", "dst").distinct()
      .join(verts.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(verts.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .filter(col("src") =!= col("dst"))
    val eBySrc = eClean.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst = eClean.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    eBySrc.count(); eByDst.count()
    graft.Log.v(s"scc: edges materialized")

    // Finished (id, comp) fragments; each is independently materialized, the
    // final answer is one lazy union over them (never re-materialized per
    // round — that would be O(V * rounds) writes).
    val assignedParts = scala.collection.mutable.ArrayBuffer[DataFrame]()

    // ---- round -1: GLOBAL trim-1 before anything else (main.cpp:172 does
    // the same) — degree-0 peeling needs no partition map, shrinks both the
    // WCC input and the first FW-BW round. Incremental formulation: full
    // in/out-degree counts are built ONCE from the two co-partitioned edge
    // copies (both aggregations are exchange-free); each subsequent sweep
    // only broadcasts the just-removed vertex set against the edge tables
    // and decrements the affected counters — O(removed·degree) per sweep
    // instead of re-scanning/shuffling the whole edge table.
    var preTrimmed = 0L
    var preSweep = 0
    var degs = arena.fresh(
      verts
        .join(eBySrc.groupBy(col("src").as("id")).agg(count(lit(1)).as("oc")), Seq("id"), "left")
        .join(eByDst.groupBy(col("dst").as("id")).agg(count(lit(1)).as("ic")), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("oc"), lit(0L)).as("oc"), coalesce(col("ic"), lit(0L)).as("ic")))
    // checkpointed (id)-pieces backing lazy (id, comp) fragments — must
    // outlive the arena alongside the fragments themselves
    val partBacking = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (removed, removedCnt) = arena.freshCounted(
      degs.filter(col("oc") === 0 || col("ic") === 0).select("id"))
    while (removedCnt > 0 && preSweep < maxTrimSweeps) {
      // singleton SCCs: comp = own id
      partBacking += removed
      assignedParts += removed.select(col("id"), col("id").as("comp"))
      val decIn = eBySrc
        .join(broadcast(removed.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
        .groupBy(col("dst").as("id")).agg(count(lit(1)).as("dIn"))
      val decOut = eByDst
        .join(broadcast(removed.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("dOut"))
      val newDegs = arena.fresh(
        degs.join(removed, Seq("id"), "left_anti")
          .join(decIn, Seq("id"), "left")
          .join(decOut, Seq("id"), "left")
          .select(col("id"),
            (col("oc") - coalesce(col("dOut"), lit(0L))).as("oc"),
            (col("ic") - coalesce(col("dIn"), lit(0L))).as("ic")))
      arena.release(degs)
      degs = newDegs
      preTrimmed += removedCnt
      preSweep += 1
      val rc = arena.freshCounted(
        degs.filter(col("oc") <= 0 || col("ic") <= 0).select("id"))
      removed = rc._1; removedCnt = rc._2
    }
    arena.release(removed)
    var live = arena.fresh(degs.select(col("id"), lit(0L).as("pivot")))
    arena.release(degs)
    graft.Log.v(s"scc: global pre-trim removed $preTrimmed in $preSweep sweeps")

    // WCC pre-partition of the trimmed remainder: SCCs never span weak
    // components, so use the WCC label (a min member id, hence a valid
    // pivot) as the initial partition.
    val liveEdges0 = eBySrc
      .join(live.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(live.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val (wcc, wccMetrics) = Wcc.run(spark, liveEdges0, live.select("id"))
    graft.Log.v(s"scc: wcc done in ${wccMetrics.size} supersteps")

    val live0 = arena.fresh(
      live.select("id").join(wcc, Seq("id"))
        .select(col("id"), col("comp").as("pivot"),
          (col("id") === col("comp")).as("fw"), (col("id") === col("comp")).as("bw")))
    arena.release(live)
    live = live0

    val metrics = Vector.newBuilder[RoundMetrics]
    var round = 0
    var liveCount = live.count()

    while (liveCount > 0 && round < maxOuter) {
      // ---- local-solve routing: partitions small enough for one task are
      // finished right here by a per-group Tarjan (one shuffle on pivot).
      var localSolved = 0L
      if (localSolveEdgeThreshold > 0) {
        val lpR = live.select(col("id"), col("pivot"))
        val leR = eBySrc
          .join(lpR.withColumnRenamed("id", "src").withColumnRenamed("pivot", "srcP"), Seq("src"))
          .join(lpR.withColumnRenamed("id", "dst").withColumnRenamed("pivot", "dstP"), Seq("dst"))
          .filter(col("srcP") === col("dstP"))
          .select(col("srcP").as("pivot"), col("src"), col("dst"))
        val groupEdgeCounts = leR.groupBy("pivot").agg(count("*").as("ec"))
        val smallPivots = arena.fresh(
          live.select("pivot").distinct()
            .join(groupEdgeCounts, Seq("pivot"), "left")
            .filter(coalesce(col("ec"), lit(0L)) <= localSolveEdgeThreshold)
            .select("pivot"))

        // Records per group: (pivot, a, b) where b = -1 marks a vertex row.
        val vertRecs = live.join(smallPivots, Seq("pivot"), "left_semi")
          .select(col("pivot"), col("id").as("a"), lit(-1L).as("b"))
        val edgeRecs = leR.join(smallPivots, Seq("pivot"), "left_semi")
          .select(col("pivot"), col("src").as("a"), col("dst").as("b"))
        val solved = arena.fresh(
          vertRecs.unionByName(edgeRecs)
            .as[(Long, Long, Long)]
            .groupByKey(_._1)
            .flatMapGroups { (_, it) =>
              val vs = scala.collection.mutable.ArrayBuffer[Long]()
              val es = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
              it.foreach { case (_, a, b) => if (b == -1L) vs += a else es += ((a, b)) }
              LocalTarjan.solve(vs.toArray, es.toArray)
            }
            .toDF("id", "comp"))
        localSolved = solved.count()
        graft.Log.v(s"scc round $round: local-solved $localSolved rows")
        if (localSolved > 0) {
          assignedParts += solved
          val newLive = arena.fresh(live.join(smallPivots, Seq("pivot"), "left_anti"))
          arena.release(live)
          live = newLive
          liveCount = live.count()
        }
        arena.release(smallPivots)
      }
      if (liveCount == 0) {
        metrics += RoundMetrics(round, localSolved, 0, 0, 0, 0, 0)
        round += 1
      } else {

      // ---- trim-1 fixpoint: peel vertices with no live in- or out-edges
      // within their partition (they are singleton SCCs). main.cpp:54-63.
      var trimmedTotal = 0L
      var trimSweep = 0
      var sweepTrimmed = 1L
      while (sweepTrimmed > 0 && trimSweep < maxTrimSweeps) {
        val lp = live.select(col("id"), col("pivot"))
        val le = eBySrc
          .join(lp.withColumnRenamed("id", "src").withColumnRenamed("pivot", "srcP"), Seq("src"))
          .join(lp.withColumnRenamed("id", "dst").withColumnRenamed("pivot", "dstP"), Seq("dst"))
          .filter(col("srcP") === col("dstP"))
          .select("src", "dst")
        val outD = le.groupBy(col("src").as("id")).agg(count("*").as("od"))
        val inD = le.groupBy(col("dst").as("id")).agg(count("*").as("idg"))
        val marked = arena.fresh(
          live
            .join(outD, Seq("id"), "left")
            .join(inD, Seq("id"), "left")
            .withColumn("dead", col("od").isNull || col("idg").isNull))
        sweepTrimmed = marked.filter(col("dead")).count()
        if (sweepTrimmed > 0) {
          assignedParts += arena.fresh(
            marked.filter(col("dead")).select(col("id"), col("id").as("comp")))
          val newLive = arena.fresh(marked.filter(!col("dead")).drop("dead", "od", "idg"))
          arena.release(live)
          live = newLive
          trimmedTotal += sweepTrimmed
        }
        arena.release(marked)
        trimSweep += 1
      }

      // ---- trim-2 (round > 0 only: on the full graph its mutual-pair scan
      // costs more than the pairs it removes save; on the post-giant
      // remainder it is cheap mop-up): mutual pair (a,b) where either both
      // vertices' only live
      // in-edges, or both vertices' only live out-edges, are each other
      // => {a,b} is a size-2 SCC (north-star extension). Pairs qualifying
      // under either variant cannot overlap: sharing a vertex would force
      // its in- (resp. out-) degree above 1.
      var pairTrimmed = 0L
      if (round > 0) {
        val lp2 = live.select(col("id"), col("pivot"))
        val le2 = eBySrc
          .join(lp2.withColumnRenamed("id", "src").withColumnRenamed("pivot", "srcP"), Seq("src"))
          .join(lp2.withColumnRenamed("id", "dst").withColumnRenamed("pivot", "dstP"), Seq("dst"))
          .filter(col("srcP") === col("dstP"))
          .select("src", "dst")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val mutual = le2.filter(col("src") < col("dst"))
          .join(le2.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"), "left_semi")
        val od2 = le2.groupBy(col("src").as("id")).agg(count("*").as("od"))
        val id2 = le2.groupBy(col("dst").as("id")).agg(count("*").as("idg"))
        val degs = od2.join(id2, Seq("id"), "full")
          .select(col("id"), coalesce(col("od"), lit(0L)).as("od"), coalesce(col("idg"), lit(0L)).as("idg"))
        val pairs = arena.fresh(
          mutual
            .join(degs.select(col("id").as("src"), col("od").as("aOd"), col("idg").as("aId")), Seq("src"))
            .join(degs.select(col("id").as("dst"), col("od").as("bOd"), col("idg").as("bId")), Seq("dst"))
            .filter((col("aId") === 1 && col("bId") === 1) || (col("aOd") === 1 && col("bOd") === 1))
            .select(col("src"), col("dst")))
        val pairMembers = pairs.select(col("src").as("id"), col("src").as("comp"))
          .unionByName(pairs.select(col("dst").as("id"), col("src").as("comp")))
        pairTrimmed = pairMembers.count()
        if (pairTrimmed > 0) {
          assignedParts += arena.fresh(pairMembers)
          val newLive = arena.fresh(live.join(pairMembers.select("id"), Seq("id"), "left_anti"))
          arena.release(live)
          live = newLive
        }
        arena.release(pairs)
        le2.unpersist(false)
      }

      liveCount = live.count()
      var bfsSteps = 0
      var sccRows = 0L
      if (liveCount > 0) {
        // ---- fw+bw reach from each partition's pivot, restricted to the
        // partition (reach_kernel, main.cpp:65-87; both directions in one
        // DAG = the v7 shape). Representation: grow-only visited PIECES
        // (one small checkpointed (id,pivot) frame per step) + a frontier,
        // instead of rewriting the full state every superstep — per-step
        // cost is O(frontier·degree) shuffle + O(visited) cached scans,
        // with zero O(state) writes. The anti-join dedup runs on `id`
        // alone (each live id has exactly one pivot, so (id) keys are
        // unique), keeping every join co-partitioned with the
        // id-partitioned pieces.
        // First re-elect each group's pivot as its min live id: trims may
        // have assigned the old pivot away, which would leave the group
        // seedless. min(live member) keeps the invariant "pivot ∈ group ∧
        // pivot = min(group)", so the SCC found around it is canonically
        // labeled.
        val relabel = live.groupBy("pivot").agg(min("id").as("newP"))
        val relabeled = arena.fresh(
          live.join(relabel, Seq("pivot")).select(col("id"), col("newP").as("pivot")))
        arena.release(live)
        live = relabeled

        val bfs0 = live
          .withColumn("fw", col("id") === col("pivot"))
          .withColumn("bw", col("id") === col("pivot"))
          .withColumn("fwNew", col("fw")).withColumn("bwNew", col("bw"))
          .withColumn("anyNew", col("fw"))
        val harness = new Superstep(spark, s"scc_bfs_$round", snapshotDir, arena = arena)
        val (reachedSt, bfsMetrics) = harness.run(
          bfs0, Int.MaxValue, changedCol = Some("anyNew")) { (st, _) =>
          // Frontier expansion. Join shapes chosen so the big sides never
          // move: frontier(id) x eBySrc(src) is co-partitioned; the
          // per-target pivot sets aggregate by id and join back to the
          // id-partitioned state — per-step shuffle bytes are O(frontier
          // out-degree); the state itself is rewritten narrowly (no state
          // shuffle). A visited-set/frontier-piece representation was
          // measured SLOWER here: once the giant component is most of the
          // state, scanning the visited pieces each step costs what the
          // state rewrite costs, plus a per-step anti-join chain.
          val fwHits = st.filter(col("fwNew"))
            .select(col("id"), col("pivot"))
            .join(eBySrc, col("id") === eBySrc("src"))
            .groupBy(eBySrc("dst").as("id"))
            .agg(collect_set(col("pivot")).as("fwPs"))
          val bwHits = st.filter(col("bwNew"))
            .select(col("id"), col("pivot"))
            .join(eByDst, col("id") === eByDst("dst"))
            .groupBy(eByDst("src").as("id"))
            .agg(collect_set(col("pivot")).as("bwPs"))
          st.drop("fwNew", "bwNew")
            .join(fwHits, Seq("id"), "left")
            .join(bwHits, Seq("id"), "left")
            .select(
              col("id"), col("pivot"),
              (col("fw") || coalesce(array_contains(col("fwPs"), col("pivot")), lit(false))).as("fw"),
              (col("bw") || coalesce(array_contains(col("bwPs"), col("pivot")), lit(false))).as("bw"),
              (!col("fw") && coalesce(array_contains(col("fwPs"), col("pivot")), lit(false))).as("fwNew"),
              (!col("bw") && coalesce(array_contains(col("bwPs"), col("pivot")), lit(false))).as("bwNew"))
            .withColumn("anyNew", col("fwNew") || col("bwNew"))
        } { _ => 0L }
        arena.release(live)
        bfsSteps = bfsMetrics.size
        val reached = reachedSt.select("id", "pivot", "fw", "bw")

        // ---- update/recolor (main.cpp:105-163): 4-way split per pivot by
        // (fw,bw); fw AND bw = the pivot's SCC, done; the rest re-pivot to
        // the min id of their color group and loop.
        val groups = reached.groupBy("pivot", "fw", "bw").agg(min("id").as("newPivot"))
        val recolored = arena.fresh(reached.join(groups, Seq("pivot", "fw", "bw")))
        arena.release(reachedSt)

        val (sccs, sccCount) = arena.freshCounted(
          recolored.filter(col("fw") && col("bw"))
            .select(col("id"), col("pivot").as("comp")))
        sccRows = sccCount
        if (sccRows > 0) assignedParts += sccs else arena.release(sccs)

        val (newLive, newLiveCount) = arena.freshCounted(
          recolored.filter(!(col("fw") && col("bw")))
            .select(col("id"), col("newPivot").as("pivot")))
        live = newLive
        arena.release(recolored)
        liveCount = newLiveCount
      }
      graft.Log.v(s"scc round $round: trimmed=$trimmedTotal pair=$pairTrimmed bfs=$bfsSteps sccRows=$sccRows live=$liveCount")
      metrics += RoundMetrics(round, localSolved, trimmedTotal, pairTrimmed, bfsSteps,
        sccRows, liveCount)
      round += 1
      }
    }
    require(liveCount == 0, s"SCC did not converge in $maxOuter rounds ($liveCount live)")

    // The parts are already materialized; the result is their lazy union —
    // re-checkpointing it here would be one more full O(V) pass for nothing.
    val result =
      if (assignedParts.isEmpty) verts.select(col("id"), col("id").as("comp")).limit(0)
      else assignedParts.reduce(_.unionByName(_))
    arena.closeExcept((assignedParts ++ partBacking).toSeq: _*)
    eBySrc.unpersist(false)
    eByDst.unpersist(false)
    (result, metrics.result())
  }


  /** The reference's full query (SURVEY.md §1.1): which SCCs are *accepted*
    * given subset U. Returns (id, comp, accepted). `vertices` must carry
    * (id, isU).
    */
  def accepted(
      spark: SparkSession,
      edges: DataFrame,
      vertices: DataFrame,
      mode: SccMode = FullGraph): DataFrame = {
    val comps = mode match {
      case FullGraph => components(spark, edges, vertices.select("id"))._1
      case InducedU =>
        val uVerts = vertices.filter(col("isU")).select("id")
        val uEdges = edges
          .join(uVerts.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(uVerts.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        components(spark, uEdges, uVerts)._1
    }
    val withU = comps.join(vertices, Seq("id"), "left")
      .select(col("id"), col("comp"), coalesce(col("isU"), lit(false)).as("isU"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val stats = withU.groupBy("comp").agg(
      count("*").as("sz"),
      (min(col("isU").cast("int")) === 1).as("allU"))

    // trim_u (main.cpp:207-222): an edge from a U vertex in another component
    // into S ⇒ prec(S)∩U ≠ ∅ ⇒ S rejected.
    val src = withU.select(col("id").as("src"), col("comp").as("srcComp"), col("isU").as("srcU"))
    val dst = withU.select(col("id").as("dst"), col("comp").as("dstComp"))
    val killed = edges.select("src", "dst")
      .join(src, Seq("src")).join(dst, Seq("dst"))
      .filter(col("srcU") && col("srcComp") =!= col("dstComp"))
      .select(col("dstComp").as("comp")).distinct()
      .withColumn("isKilled", lit(true))

    val out = withU
      .join(stats, Seq("comp"))
      .join(killed, Seq("comp"), "left")
      .select(
        col("id"), col("comp"),
        (col("sz") >= 2 && col("allU") && coalesce(col("isKilled"), lit(false)) === false)
          .as("accepted"))
      .localCheckpoint(true)
    withU.unpersist(false)
    out
  }

  /** The reference's printed answer (`standalone.cpp:309-326`): members of
    * one accepted SCC in ascending order — deterministically the one with
    * the smallest component id (replacing the reference's GPU race,
    * `scc_operations.cu:409-420`). Empty result = "No SCCs found".
    */
  def answer(acceptedDf: DataFrame): DataFrame = {
    val chosen = acceptedDf.filter(col("accepted")).agg(min("comp").as("comp"))
    acceptedDf.join(chosen, Seq("comp"), "left_semi")
      .select("id").orderBy("id")
  }

  /** `count_distinct_scc` (standalone.cpp:329-344): number of accepted SCCs. */
  def countAccepted(acceptedDf: DataFrame): Long =
    acceptedDf.filter(col("accepted")).select("comp").distinct().count()
}
