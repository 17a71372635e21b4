package graft

import org.apache.spark.sql.functions._

import graft.operators.Scc
import graft.sources.GraphFile

/** spark-submit entry point mirroring the reference binaries' CLI
  * (`/root/reference/standalone.cpp:356-383`): read a `% m n` graph file,
  * compute the accepted SCCs for its U subset, print the members of one
  * (deterministically the min-id component, ascending) or `No SCCs found`.
  *
  * Usage: SccCli <graph-file> [full|induced] [cores]
  *   full    — oracle semantics (SCCs of G, filtered; misc/verify.py)
  *   induced — reference-engine semantics (SCCs of G[U]); default
  */
object SccCli {

  /** The CLI body, session-agnostic (tested directly in SccSpec): returns
    * the exact lines `main` prints — reference parity with
    * standalone.cpp:309-326's output shape.
    */
  def run(spark: org.apache.spark.sql.SparkSession, path: String,
      mode: Scc.SccMode): Seq[String] = {
    val g = GraphFile.read(spark, path)
    // the `% m n` header declares the dense vertex range; the reference's
    // loader trusts it the same way (no bounds checks, file2graph.cpp)
    val acc = Scc.accepted(spark, g.edges, g.vertices, mode,
      edgesWithinVertices = true)
    val nAccepted = Scc.countAccepted(acc)
    if (nAccepted == 0) Seq("No SCCs found")
    else {
      val members = Scc.answer(acc).collect().map(_.getLong(0))
      s"accepted SCCs: $nAccepted" +: "SCC:" +: members.map(_.toString).toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SccCli <graph-file> [full|induced] [cores]")
    // the two modes return DIFFERENT accepted sets — a typo must be a usage
    // error, never a silent fallback to induced semantics
    val mode = args.drop(1).headOption match {
      case None | Some("induced") => Scc.InducedU
      case Some("full") => Scc.FullGraph
      case Some(other) => throw new IllegalArgumentException(
        s"unknown mode '$other' — usage: SccCli <graph-file> [full|induced] [cores]")
    }
    val cores = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, args(0), mode).foreach(println)
    spark.stop()
  }
}
