package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (tests, Bench, Verify)
  * gets the same scale-oriented defaults: AQE on (runtime re-plan + skew-join
  * splitting), shuffle partitions sized to the actual core count rather than
  * the 200 default, and UTC so timestamp results match the DuckDB oracle.
  */
object Sessions {
  def local(cores: Int, shufflePartitions: Option[Int] = None): SparkSession = {
    val sp = shufflePartitions.getOrElse(cores)
    val aqe = !sys.env.get("GRAFT_AQE").contains("0")
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
