package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for power-law graphs (north_rule: "partitioning /
  * shuffle / skew handled explicitly"; SURVEY.md §4(b)).
  *
  * Layered defense:
  *   1. AQE skew-join splitting is ON session-wide ([[graft.Sessions]]) —
  *      it re-splits oversized sort-merge partitions at runtime and covers
  *      most frontier⨝edges joins for free.
  *   2. Map-side partial aggregation makes sum/min/count groupBys
  *      hub-tolerant without help (Spark hash aggregates combine before the
  *      shuffle), so degree counting and PageRank contribution sums need no
  *      salting.
  *   3. What neither fixes: set/list aggregation buffers for a key with
  *      MANY DISTINCT values. collect_set does partially aggregate (the
  *      map side dedups rows), but the reduce-side buffer for a hub key
  *      still accumulates every distinct value in one task. [[saltedJoin]]
  *      and [[saltedCollectSet]] split each hub key into `saltFactor`
  *      sub-keys (salting by VALUE hash, so distinct values spread),
  *      replicate the other side per salt, re-merge after.
  *
  * Live call site: [[Scc.components]]' BFS pivot-set aggregation switches
  * to [[saltedCollectSet]] when the graph's max degree exceeds its
  * `hubDegreeThreshold` (SccSpec "skewed hub graph" exercises the path).
  */
object Salting {

  /** Degree-based hub split of `left ⨝ right ON left(key) = right(key)`:
    * hub keys (right-side multiplicity > hubThreshold) are salted —
    * right rows get `salt = hash(row) % saltFactor`, left hub rows are
    * replicated across all salts — so no single task owns a whole hub.
    * Non-hub keys take the plain join. Inner join semantics.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      hubThreshold: Long = 1000000, saltFactor: Int = 32): DataFrame = {
    val counts = right.groupBy(key).agg(count(lit(1)).as("_cnt"))
    val hubKeys = counts.filter(col("_cnt") > hubThreshold).select(key)

    val rightHub = right.join(hubKeys, Seq(key), "left_semi")
      .withColumn("_salt", pmod(xxhash64(struct(right.columns.map(col): _*)), lit(saltFactor)))
    val leftHub = left.join(hubKeys, Seq(key), "left_semi")
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    val hubJoined = leftHub.join(rightHub, Seq(key, "_salt")).drop("_salt")

    val rightRest = right.join(hubKeys, Seq(key), "left_anti")
    val leftRest = left.join(hubKeys, Seq(key), "left_anti")
    leftRest.join(rightRest, Seq(key)).unionByName(hubJoined)
  }

  /** Skew-safe `groupBy(key).agg(collect_set(value))` — collect_set has no
    * useful partial aggregation when one key holds most values, so build it
    * in two levels: per-(key, salt) sets, then flatten+dedup per key.
    */
  def saltedCollectSet(
      df: DataFrame, key: String, value: String, saltFactor: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(value)), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(value)).as("_part"))
      .groupBy(col(key))
      .agg(array_distinct(flatten(collect_list(col("_part")))).as(s"${value}s"))

  /** [[saltedCollectSet]] over rows carrying a boolean direction flag
    * (`dirCol`): builds BOTH direction sets in the same two-level shuffle —
    * `collect_set` skips the nulls `when(dir, v)` produces for the other
    * direction. One exchange instead of two; used by the SCC BFS hop.
    */
  def saltedDirectionalCollectSet(
      df: DataFrame, key: String, value: String, dirCol: String,
      fwdName: String, bwdName: String, saltFactor: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(value)), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(when(col(dirCol), col(value))).as("_pf"),
        collect_set(when(!col(dirCol), col(value))).as("_pb"))
      .groupBy(col(key))
      .agg(array_distinct(flatten(collect_list(col("_pf")))).as(fwdName),
        array_distinct(flatten(collect_list(col("_pb")))).as(bwdName))
}
