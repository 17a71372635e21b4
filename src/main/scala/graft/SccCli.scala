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
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SccCli <graph-file> [full|induced] [cores]")
    val mode = if (args.length > 1 && args(1) == "full") Scc.FullGraph else Scc.InducedU
    val cores = if (args.length > 2) args(2).toInt else 4
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")

    val g = GraphFile.read(spark, args(0))
    val acc = Scc.accepted(spark, g.edges, g.vertices, mode)
    val nAccepted = Scc.countAccepted(acc)
    if (nAccepted == 0) println("No SCCs found")
    else {
      println(s"accepted SCCs: $nAccepted")
      val members = Scc.answer(acc).collect().map(_.getLong(0))
      println("SCC:")
      members.foreach(println)
    }
    spark.stop()
  }
}
