package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props): watermarked windowed
  * aggregation and stateful sessionization via `flatMapGroupsWithState`.
  * The reference is strictly batch (SURVEY.md §2.2) — this is the
  * north-star streaming extension; batch parquet drives the same plan in
  * tests via the file source + `processAllAvailable`.
  */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window per-type aggregate with a 10-minute watermark:
    * (window, event_type, n, total). Append-mode safe.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("total"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, startMs: Long, endMs: Long, n: Int, total: Double)

  /** Sessionize per user with an inactivity gap, using EVENT-time timeouts
    * against the watermark — deterministic (no wall-clock dependence): a
    * session closes when a later same-user event exceeds the gap, or when
    * the watermark passes sessionEnd + gap. The custom-state operator the
    * reference has no analog for — flatMapGroupsWithState is the
    * Spark-native escape hatch for it. Input must carry a watermark on
    * `ts` (see [[sessionizeStream]]).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.last, s.n, s.total))
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            for (e <- evs) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
                  // In or within-gap of the open session. The span only ever
                  // WIDENS: an in-watermark out-of-order event from a later
                  // micro-batch can have t < s.last (or < s.start), and
                  // overwriting `last` with it would rewind the session end
                  // and its event-time timeout, emitting a shrunken session
                  // the batch form (global sort) never produces.
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) if t < s.start =>
                  // Above-watermark straggler OLDER than the open session by
                  // more than the gap: a separate, earlier session. Emitted
                  // as a singleton immediately — by the time the open
                  // session exists, no future event can bridge the two, and
                  // holding a second open session per key would unbound the
                  // state. (Approximation: two such stragglers within a gap
                  // of each other emit as two singletons where the batch
                  // form merges them — they'd have to be later than the
                  // watermark yet more than a gap older than the open
                  // session's start.)
                  out += Session(uid, t, t, 1, e.value)
                case Some(s) =>
                  out += Session(uid, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the event-time watermark passes last + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Watermarked typed view for [[sessionize]] over the events schema. */
  def sessionizeStream(
      events: DataFrame, gapMs: Long = 30 * 60 * 1000,
      watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    sessionize(
      events
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event],
      gapMs)
  }

  /** Streaming exact deduplication — the ingest-side twin of
    * [[graft.functions.Dedup.exact]] for a training-data pipeline that
    * consumes an event/document stream: drop repeats of the same key within
    * the watermark horizon. State is bounded by the watermark (old keys are
    * evicted once the event-time watermark passes), so this runs forever on
    * an unbounded stream — the property batch dedup cannot give you.
    * `keys` defaults to the natural event identity; pass a content hash
    * column for content-based dedup.
    */
  def dedupStream(
      events: DataFrame,
      watermark: String = "10 minutes",
      keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked STREAM-STREAM interval join — the streaming twin of the
    * batch as-of semantics ([[graft.functions.AsOf]]): every purchase event
    * joined to the same user's view events within `[purchase.ts − maxLag,
    * purchase.ts]` (the attribution query). Equality key `user_id` +
    * event-time interval condition is exactly the shape Structured
    * Streaming's symmetric hash join supports; the watermark on BOTH sides
    * plus the interval bound lets Spark evict join state older than
    * watermark − maxLag, so state stays bounded on an unbounded stream.
    * Append mode. Both inputs may be the same stream (a stream self-join) —
    * [[viewsBeforePurchases]] below splits one event stream by type.
    *
    * `joinType = "left_outer"` keeps unmatched purchases: once the
    * watermark proves no view can still arrive inside the interval
    * (views-side watermark past `purchase_ts`), the purchase emits with
    * null view columns — the attribution use-case's "purchase with no
    * prior view" rows, which the inner form silently drops. Same state
    * bounds as the inner join (Spark supports outer stream-stream joins
    * exactly when the watermark + time constraint make eviction provable).
    */
  def viewsBeforePurchases(
      events: DataFrame, maxLag: String = "15 minutes",
      watermark: String = "10 minutes", joinType: String = "inner"): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast("timestamp"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    val views = base.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    purchases.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxLag"),
      joinType)
      .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts", "value")
  }

  /** Batch-equivalent sessionization (same gap semantics) for verification:
    * session boundaries via lag() windows — the DuckDB-oracle-friendly form.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sessionId")
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("prevTs", lag("ts", 1).over(w))
      .withColumn("newSession",
        when(col("prevTs").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prevTs"))) > gapMs, 1).otherwise(0))
      .withColumn("sessionId", sum("newSession").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sessionId")
      .agg(
        min("ts").as("sessionStart"),
        max("ts").as("sessionEnd"),
        count("*").as("n"),
        sum("value").as("total"))
  }
}
