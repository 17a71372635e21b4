package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference's whitespace graph-file format
  * (parsed at `/root/reference/utils/file2graph.cpp:19-102`):
  *
  * {{{
  * % <num_edges> <num_nodes>     // header: EDGES FIRST (file2graph.cpp:27-28)
  * <src> <dst> [ignored weight…] // edge lines, extra tokens dropped (l.49)
  * ...
  * <u_id>                        // trailing single-token lines: the U subset
  * }}}
  *
  * The reference needs edges pre-sorted for its single-pass CSR build; a
  * declarative edge DataFrame has no such requirement, so we accept any order.
  * Vertex ids are dense 0..n-1; vertices absent from any edge line still exist.
  */
object GraphFile {

  final case class Graph(edges: DataFrame, vertices: DataFrame, numNodes: Long, numEdges: Long)

  /** Spark-native parse: returns (edges(src,dst), vertices(id,isU), n, m). */
  def read(spark: SparkSession, path: String): Graph = {
    val lines = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("toks"))
      .filter(size(col("toks")) > 0 && col("toks").getItem(0) =!= "")

    val header = lines
      .filter(col("toks").getItem(0) === "%")
      .select(
        col("toks").getItem(1).cast("long").as("m"),
        col("toks").getItem(2).cast("long").as("n"))
      .head()
    val (m, n) = (header.getLong(0), header.getLong(1))

    val edges = lines
      .filter(col("toks").getItem(0) =!= "%" && size(col("toks")) >= 2)
      .select(
        col("toks").getItem(0).cast("long").as("src"),
        col("toks").getItem(1).cast("long").as("dst"))

    val uIds = lines
      .filter(col("toks").getItem(0) =!= "%" && size(col("toks")) === 1)
      .select(col("toks").getItem(0).cast("long").as("id"))
      .distinct()

    val vertices = spark
      .range(n)
      .join(uIds.withColumn("u", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("u"), lit(false)).as("isU"))

    Graph(edges, vertices, n, m)
  }

  /** Driver-side parse of the same format, for small test fixtures and the
    * in-test Tarjan oracle. Kept semantically identical to [[read]].
    */
  def parseLocal(content: String): (Seq[(Long, Long)], Long, Set[Long]) = {
    var n = 0L
    val edges = Seq.newBuilder[(Long, Long)]
    val u = Set.newBuilder[Long]
    content.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val toks = line.split("\\s+")
      if (toks(0) == "%") n = toks(2).toLong
      else if (toks.length >= 2) edges += ((toks(0).toLong, toks(1).toLong))
      else u += toks(0).toLong
    }
    (edges.result(), n, u.result())
  }
}
