package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

class StreamingSpec extends SparkTest {

  test("windowed counts over streamed events match the batch plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(EventStream.schema).parquet(dir)
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .select(col("window.start").cast("string").as("ws"), col("event_type"), col("n"),
        round(col("total"), 4).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("total"))
      .select(col("window.start").cast("string").as("ws"), col("event_type"), col("n"),
        round(col("total"), 4).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    assert(streamed == batch)
  }

  test("streaming dedup drops watermark-window repeats, keeps one row per key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // duplicate every event once (same event_id, same ts) — the repeats a
    // re-delivered ingest produces
    events.unionByName(events).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(EventStream.schema).parquet(dir)
    val q = EventStream.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0))
    val expected = events.select("event_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed.length == streamed.toSet.size, "stream emitted duplicate keys")
    assert(streamed.toSet == expected)
  }

  test("stateful sessionization emits sessions consistent with the batch form") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(EventStream.schema.fields.dropRight(1)))
      .parquet(dir)
    val q = EventStream.sessionizeStream(stream, gapMs = 10 * 60 * 1000, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamedClosed = spark.table("sess_out")
      .select("user_id", "startMs", "endMs", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    val batch = EventStream.sessionizeBatch(
      spark.read.parquet(dir), gapMs = 10 * 60 * 1000)
      .select(col("user_id"), unix_millis(col("sessionStart").cast("timestamp")),
        unix_millis(col("sessionEnd").cast("timestamp")), col("n").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // The stream only emits sessions CLOSED by a newer event or timeout;
    // open sessions stay in state. Every emitted session must be a batch
    // session, and most batch sessions should have been emitted.
    assert(streamedClosed.subsetOf(batch),
      s"stream emitted ${streamedClosed.size} sessions, ${(streamedClosed -- batch).size} not in batch")
    assert(streamedClosed.size >= batch.size / 2,
      s"only ${streamedClosed.size} of ${batch.size} sessions emitted")
  }

  test("sessionize never rewinds on an in-watermark out-of-order event") {
    // An above-watermark event from a LATER micro-batch that lands INSIDE
    // (or within-gap of) the open session must widen the span, not rewind
    // it: the old unconditional `last = t` shrank the session end, and a
    // following event then split it into a Session(endMs < startMs) the
    // batch form (global sort) never produces.
    val s = spark; import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.Event]
    val gapMs = 30 * 60 * 1000L
    val q = EventStream.sessionize(
        mem.toDS().withWatermark("ts", "2 hours").as[EventStream.Event], gapMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo")
      .start()
    def ev(id: Long, minute: Long) = EventStream.Event(
      id, new java.sql.Timestamp(minute * 60000L), 7L, "view", 1.0)
    mem.addData(ev(1, 630)) // 10:30 opens the session
    q.processAllAvailable()
    mem.addData(ev(2, 605)) // 10:05 — out of order, above watermark, in gap
    q.processAllAvailable()
    mem.addData(ev(3, 645)) // 10:45 — in gap of the TRUE session end (10:30)
    q.processAllAvailable()
    mem.addData(ev(4, 900)) // 15:00 — gap exceeded: closes + emits the session
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_ooo").select("startMs", "endMs", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sessions.forall { case (st, en, _) => en >= st },
      s"emitted a rewound session (endMs < startMs): $sessions")
    assert(sessions == Set((605 * 60000L, 645 * 60000L, 3)),
      s"expected the widened [10:05, 10:45] n=3 session, got $sessions")
  }

  test("stream-stream interval join (views before purchases) == batch join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(EventStream.schema).parquet(dir)
    val q = EventStream.viewsBeforePurchases(stream, maxLag = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssjoin_out").select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch twin: the same interval condition as a plain join
    val batch = EventStream.viewsBeforePurchases(spark.read.parquet(dir),
        maxLag = "30 minutes")
      .select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // inner stream-stream joins emit matches as both sides arrive; a
    // finite drained source must produce exactly the batch answer
    assert(batch.nonEmpty, "fixture produced no purchase-view matches")
    assert(streamed == batch,
      s"missed=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
  }

  test("LEFT-OUTER stream-stream interval join emits watermark-expired nulls == batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssloj").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(EventStream.schema).parquet(dir)
    val q = EventStream.viewsBeforePurchases(stream, maxLag = "30 minutes",
        joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssloj_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q.stop()

    // A finite drained source leaves the final watermark at max(ts) − delay:
    // purchases above (watermark − maxLag) may still be holding out for a
    // match and their null rows legitimately never emit. Compare the
    // guaranteed-decided region only.
    val maxTsMs = events.agg(max(unix_millis(col("ts").cast("timestamp"))))
      .head().getLong(0)
    val decidedBelowMs =
      maxTsMs - (10 + 30 + 1) * 60 * 1000L // watermark + maxLag + 1min slack

    def decided(df: org.apache.spark.sql.DataFrame) = df
      .filter(unix_millis(col("purchase_ts")) < decidedBelowMs)
      .select(col("purchase_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val streamed = decided(spark.table("ssloj_out"))
    val batch = decided(EventStream.viewsBeforePurchases(
      spark.read.parquet(dir), maxLag = "30 minutes", joinType = "left_outer"))

    assert(batch.exists(_._2 == -1L), "fixture produced no unmatched purchases")
    assert(streamed == batch,
      s"missed=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // every matched pair the inner join finds in the decided region is here
    // too (outer ⊇ inner), and no purchase appears both matched and null
    val nullIds = streamed.collect { case (p, -1L) => p }
    assert(nullIds.toSet.intersect(streamed.collect {
      case (p, v) if v != -1L => p }.toSet).isEmpty,
      "a purchase emitted both a match and a null row")
  }
}
