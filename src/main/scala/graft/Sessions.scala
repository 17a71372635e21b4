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
      // Tungsten page size: the derived default on a big-heap/many-core JVM
      // lands at 32 MB, and a RowBasedKeyValueBatch (hash-agg fast path)
      // allocates one full page PER TASK — pure allocation+zeroing overhead
      // on small stages (thread-dump evidence, OPTIMIZATION_r06.md). 4 MB
      // removes that fixed cost and A/B'd POSITIVE at bench scale too
      // (15.3M-edge SCC @32: walls 36.9/38.7 s vs 41.0-41.9 s, gcSec
      // ~110 vs ~230 — the 32 MB page churn was feeding the collector);
      // env knob for re-measurement on other hardware.
      .config("spark.buffer.pageSize", sys.env.getOrElse("GRAFT_PAGE_SIZE", "4m"))
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
