package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

/** Spark-internal access shim (hence the package) for one operation the
  * public Dataset API cannot express: an eager lineage-cutting checkpoint
  * that does NOT carry the source plan's estimated statistics forward.
  *
  * Why: `Dataset.localCheckpoint` preserves the optimized plan's stats on
  * the resulting `LogicalRDD` (`originStats`). In an iterative superstep,
  * join-size estimation multiplies those stats every iteration — and a
  * self-join squares them — so the estimated `sizeInBytes` BigInt doubles
  * its bit length per superstep and Catalyst's
  * `SizeInBytesOnlyStatsPlanVisitor` ends up spending minutes in
  * `BigInteger.multiply` (driver CPU, observed via jstack: ~100 s/step by
  * superstep 20 on a 50k-row state). Rebuilding the DataFrame from the
  * materialized `InternalRow` RDD resets the leaf to default stats, keeping
  * per-step planning O(plan size). Join-strategy quality is unaffected in
  * practice because AQE re-plans from *runtime* shuffle sizes.
  */
object GraftShims {

  /** Eagerly materialize `df` into a cached, lineage-truncated RDD and wrap
    * it in a fresh DataFrame with default (not inherited) stats. Returns the
    * DataFrame and the backing RDD handle so callers can `unpersist` the
    * state once superseded.
    */
  def checkpointFresh(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // toRdd rows are reused per-partition buffers; copy before caching.
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint() // persist + mark RDD lineage truncation
    rdd.count()           // materialize now (one job)
    val out = session.internalCreateDataFrame(rdd, df.schema)
    (out, rdd)
  }
}
