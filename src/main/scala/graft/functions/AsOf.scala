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

  /** For every `left` row, attach the LAST `right` row at-or-before it in
    * (tsCol, seqCol) lexicographic order within the same `keys` —
    * inclusive semantics, deterministic because `seqCol` is unique across
    * both sides. Output = all left columns + the `payload` columns from
    * the matched right row (null when no match precedes).
    *
    * `right` must carry `keys ++ Seq(tsCol, seqCol) ++ payload`.
    */
  def lastBefore(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String]): DataFrame = {
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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("_m").getField(p).as(p)): _*)
  }
}
