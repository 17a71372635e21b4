package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting on the undirected view of a directed edge table
  * (north-star capability, SURVEY.md §2.3 — absent from the reference).
  *
  * Standard two-hop + closing-edge plan with **degree-ordered orientation**
  * (the classic "count each triangle once and bound wedge fan-out by the
  * lower-degree endpoint" trick): orient each undirected edge from the
  * (deg, id)-smaller endpoint to the larger, so every triangle {x,y,z}
  * is generated exactly once from its smallest-rank vertex, and hub vertices
  * never fan out — the skew handling that makes this survive power-law
  * graphs at scale without salting. Both [[total]] and [[perVertex]] run
  * the same oriented plan; perVertex just counts each found triangle's
  * three corners instead of the triangle rows.
  */
object Triangles {

  /** Canonical undirected edges (a < b), self-loops dropped, deduped. */
  def canonicalEdges(edges: DataFrame): DataFrame =
    edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Degree-ordered orientation (lo, hi): rank(v) = (deg(v), v)
    * lexicographic, each canonical edge oriented low-rank → high-rank. */
  private def orient(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(functions.count("*").as("deg"))
    canon
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "degA"), Seq("a"))
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "degB"), Seq("b"))
      .select(
        when(col("degA") < col("degB") || (col("degA") === col("degB") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("degA") < col("degB") || (col("degA") === col("degB") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
  }

  /** One row (x, y, z) per triangle, generated from its min-rank corner x:
    * wedges fan out from the LOW-rank endpoint only (a degree-d hub
    * generates wedges bounded by its lower-ranked neighborhood, not d²),
    * closed by an oriented edge between y and z in either direction. */
  private def triangleRows(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(col("lo").as("x"), col("hi").as("y"))
    val e2 = oriented.select(col("lo").as("x"), col("hi").as("z"))
    val wedges = e1.join(e2, Seq("x")).filter(col("y") < col("z"))
    val closing = oriented.select(col("lo").as("cy"), col("hi").as("cz"))
      .unionByName(oriented.select(col("hi").as("cy"), col("lo").as("cz")))
    wedges.join(closing, col("y") === col("cy") && col("z") === col("cz"), "left_semi")
  }

  /** Total triangle count (1-row DataFrame: triangles: long). */
  def total(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    val result = triangleRows(oriented).agg(functions.count("*").as("triangles"))
    val out = result.localCheckpoint(true)
    canon.unpersist(false)
    oriented.unpersist(false)
    out
  }

  /** Per-vertex triangle participation count (id, triangles): each found
    * triangle contributes one to all three corners. Vertices in no triangle
    * are absent. */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    // explode the three corners in ONE pass over the triangle rows (a
    // 3-way union of selects over `tri` would re-run the wedge join per
    // branch)
    val out = triangleRows(oriented)
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(functions.count("*").as("triangles"))
      .localCheckpoint(true)
    canon.unpersist(false)
    oriented.unpersist(false)
    out
  }
}
