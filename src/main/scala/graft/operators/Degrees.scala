package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree statistics over an edge table — the building block the reference's
  * trimming pass computes implicitly per CSR row
  * (`/root/reference/cuda/scc_operations.cu:104-118`).
  * Also used for hub detection (degree > τ → salted joins).
  */
object Degrees {

  /** (id, outDeg, inDeg, deg) — full outer so zero-degree sides survive. */
  def all(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val outD = edges.groupBy(col("src").as("id")).agg(count("*").as("outDeg"))
    val inD = edges.groupBy(col("dst").as("id")).agg(count("*").as("inDeg"))
    vertices
      .select("id")
      .join(outD, Seq("id"), "left")
      .join(inD, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("outDeg"), lit(0L)).as("outDeg"),
        coalesce(col("inDeg"), lit(0L)).as("inDeg"),
        (coalesce(col("outDeg"), lit(0L)) + coalesce(col("inDeg"), lit(0L))).as("deg"))
  }

  /** Vertices whose total degree exceeds `threshold` — the skew hubs that get
    * salted before high-fanout frontier joins (SURVEY.md §4).
    */
  def hubs(edges: DataFrame, vertices: DataFrame, threshold: Long): DataFrame =
    all(edges, vertices).filter(col("deg") > threshold).select("id", "deg")
}
