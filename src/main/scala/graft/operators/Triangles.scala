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
  * (deg, id)-smaller endpoint to the larger, so every triangle {a,b,c}
  * is generated exactly once from its smallest-rank vertex, and hub vertices
  * never fan out — the skew handling that makes this survive power-law
  * graphs at scale without salting.
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

  /** Total triangle count (1-row DataFrame: triangles: long). */
  def total(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).persist(StorageLevel.MEMORY_AND_DISK)

    // degree-ordered orientation: rank(v) = (deg(v), v) lexicographic
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(functions.count("*").as("deg"))

    val oriented = canon
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "degA"), Seq("a"))
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "degB"), Seq("b"))
      .select(
        when(col("degA") < col("degB") || (col("degA") === col("degB") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("degA") < col("degB") || (col("degA") === col("degB") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // wedges from the low-rank vertex; close with an oriented edge
    val e1 = oriented.select(col("lo").as("x"), col("hi").as("y"))
    val e2 = oriented.select(col("lo").as("x"), col("hi").as("z"))
    val wedges = e1.join(e2, Seq("x")).filter(col("y") < col("z"))

    val closing = oriented.select(col("lo").as("cy"), col("hi").as("cz"))
      .unionByName(oriented.select(col("hi").as("cy"), col("lo").as("cz")))

    val result = wedges
      .join(closing, col("y") === col("cy") && col("z") === col("cz"), "left_semi")
      .agg(functions.count("*").as("triangles"))

    val out = result.localCheckpoint(true)
    canon.unpersist(false)
    oriented.unpersist(false)
    out
  }

  /** Per-vertex triangle participation count (id, triangles). */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = canon.select(col("a").as("x"), col("b").as("y"))
    val e2 = canon.select(col("a").as("x"), col("b").as("z"))
    val wedges = e1.join(e2, Seq("x")).filter(col("y") < col("z"))
    val tri = wedges
      .join(canon, col("y") === canon("a") && col("z") === canon("b"), "left_semi")
    val out = tri.select(col("x").as("id"))
      .unionByName(tri.select(col("y").as("id")))
      .unionByName(tri.select(col("z").as("id")))
      .groupBy("id").agg(functions.count("*").as("triangles"))
      .localCheckpoint(true)
    canon.unpersist(false)
    out
  }
}
