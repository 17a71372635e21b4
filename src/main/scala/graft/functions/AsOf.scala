package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row at-or-before it —
  * an operator Spark's API lacks natively. Composed from existing
  * operators (the preferred ladder before custom plans): the two sides
  * UNION with a side tag and the right payload packed in one struct, a
  * single per-key window carries the last non-null payload forward, and
  * the left side re-emerges with its match attached. ONE shuffle on the
  * partition keys plus one per-key external sort — never a per-row range
  * probe or a time-bucketed self-join, so cost is O((|L|+|R|) log) per
  * key and hub keys degrade to a bigger sort, not a cross product.
  */
object AsOf {

  /** The tagged union both variants run their window over: left rows carry
    * a null payload, right rows pack `payload` into one struct and null
    * out left-only columns. Columns: leftCols ++ (_side, _pay).
    */
  private def taggedUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String]): (DataFrame, Seq[String]) = {
    val payStruct = struct(payload.map(col): _*)
    val payType = right.select(payStruct.as("_pay")).schema("_pay").dataType
    val leftCols = left.columns.toSeq
    val l = left.select(leftCols.map(col) :+ lit(1).as("_side") :+
      lit(null).cast(payType).as("_pay"): _*)
    // right rows contribute only key/order columns; left-only columns null
    val r = leftCols.foldLeft(
      right.select((keys ++ Seq(tsCol, seqCol)).distinct.map(col) :+
        lit(0).as("_side") :+ payStruct.as("_pay"): _*)) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(leftCols.map(col) :+ col("_side") :+ col("_pay"): _*)
    (l.unionByName(r), leftCols)
  }

  /** For every `left` row, attach the LAST `right` row at-or-before it in
    * (tsCol, seqCol) lexicographic order within the same `keys` —
    * inclusive semantics, deterministic because `seqCol` is unique across
    * both sides. Output = all left columns + the `payload` columns from
    * the matched right row (null when no match precedes).
    *
    * `right` must carry `keys ++ Seq(tsCol, seqCol) ++ payload`.
    *
    * Skew bound: the per-key window puts ALL of one key's rows (both
    * sides) in one task's external sort — hub keys degrade to a bigger
    * sort, never a cross product, but at ~10⁶+ rows under a single key the
    * single task IS the wall clock (measured bound pinned by AsOfSpec's
    * hot-key test). Past that, use [[lastBeforeBucketed]]: same contract,
    * per-task size capped by time bucket.
    */
  def lastBefore(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String]): DataFrame = {
    val (u, leftCols) = taggedUnion(left, right, keys, tsCol, seqCol, payload)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("_m").getField(p).as(p)): _*)
  }

  /** [[lastBefore]] with the hot-key ceiling removed: the classic parallel
    * prefix-scan decomposition over time buckets of `bucketWidth` ticks.
    *
    *   1. Window over (keys, bucket) carries the last payload WITHIN each
    *      bucket — per-task sort size is one key's rows in ONE bucket, so
    *      a mega-key (10⁸ rows at 100 TB) spreads over its time range
    *      instead of landing in one task.
    *   2. One row per (key, bucket) — the bucket's final right payload,
    *      null for right-empty buckets — flows through a second window
    *      over buckets-strictly-before, giving each bucket its incoming
    *      carry. This frame is |keys|×|buckets| rows: tiny, and the only
    *      per-key-serial state.
    *   3. Joined back on (keys, bucket); match = within-bucket carry,
    *      else incoming carry (struct-level coalesce — a matched payload
    *      with legitimately-null fields must not fall through).
    *
    * Exactly [[lastBefore]]'s semantics for any bucketWidth (equivalence
    * is property-tested across widths); `tsCol` must be integral.
    */
  def lastBeforeBucketed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive; got $bucketWidth")
    val (u0, leftCols) = taggedUnion(left, right, keys, tsCol, seqCol, payload)
    // exact floor division ENTIRELY in the long domain (negative ts
    // included): subtract the non-negative remainder, then integral `div` —
    // truncating division of an exact multiple equals floor. (The previous
    // double-division form was exact only for |ts| < 2^53 — nanosecond-scale
    // timestamps exceed that; ADVICE r4.) Remaining edge: ts within
    // bucketWidth of Long.MinValue underflows the subtraction — physically
    // unreachable for any time encoding (negative 2^63 ns ≈ year −290),
    // documented rather than guarded.
    val u = u0.withColumn("_bkt",
      expr(s"((`$tsCol` - pmod(`$tsCol`, $bucketWidth)) div $bucketWidth)"))
    val keyCols = keys.map(col)
    val wIn = Window.partitionBy(keyCols :+ col("_bkt"): _*)
      .orderBy(col(tsCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u.withColumn("_m1", last(col("_pay"), ignoreNulls = true).over(wIn))
    // per-(key, bucket) final right payload; buckets holding only left rows
    // keep a null _fin but still occupy a row, so the carry window passes
    // the latest earlier payload THROUGH them to later buckets
    val bucketLast = u
      .groupBy(keyCols :+ col("_bkt"): _*)
      .agg(max(when(col("_side") === 0,
        struct(col(tsCol), col(seqCol), col("_pay")))).as("_fin"))
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = bucketLast
      .withColumn("_in", last(col("_fin"), ignoreNulls = true).over(wCarry))
      .select(keyCols ++ Seq(col("_bkt"), col("_in").getField("_pay").as("_inPay")): _*)
    within
      .join(carries, keys :+ "_bkt", "left")
      .filter(col("_side") === 1)
      .withColumn("_m", coalesce(col("_m1"), col("_inPay")))
      .select(leftCols.map(col) ++ payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
