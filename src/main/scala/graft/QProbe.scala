package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query timing probe (not part of the contract):
  * `runMain graft.QProbe <queryName> <sfDir> [cores] [repeat]`.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cores = if (args.length > 2) args(2).toInt else 8
    val repeat = if (args.length > 3) args(3).toInt else 3
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    val fn = SparkEntry.queries(name)
    (0 until repeat).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
