package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.local(4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTest extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def edgesDf(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  def vertsDf(vertices: Seq[Long], u: Set[Long] = Set.empty): DataFrame = {
    val s = spark
    import s.implicits._
    vertices.map(v => (v, u(v))).toDF("id", "isU")
  }

  /** Load a reference-format graph fixture from test resources. */
  def fixture(name: String): (Seq[(Long, Long)], Long, Set[Long]) = {
    val text = scala.io.Source.fromResource(s"graphs/$name").mkString
    graft.sources.GraphFile.parseLocal(text)
  }
}
