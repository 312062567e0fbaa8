package graft

import java.sql.Timestamp
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermark / session semantics the DuckDB oracle can't see (SURVEY.md
  * §2.13): late rows beyond the watermark are dropped from append-mode
  * sinks; session windows close after the gap; duplicate ids are dropped
  * within the watermark horizon.
  */
class StreamingSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def t(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  private var sinkId = 0
  private def runStream(input: Seq[Seq[Ev]],
      op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = op(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    input.foreach { batch => mem.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("tumbling agg in append mode drops rows later than the watermark") {
    val out = runStream(Seq(
      Seq(Ev(1, t(5), 1, "click", 1.0), Ev(2, t(10), 1, "click", 2.0)),
      // advance event time well past the first hour + watermark
      Seq(Ev(3, t(135), 1, "click", 3.0)),
      // LATE: arrives with event time inside hour 0, watermark is far past
      Seq(Ev(4, t(15), 1, "click", 99.0)),
      // push watermark further so hour-0/hour-2 windows finalize
      Seq(Ev(5, t(300), 1, "click", 5.0))
    ), StreamOps.tumbling, OutputMode.Append())
    val hour0 = out.where("ws = timestamp'2024-01-01 00:00:00'")
      .select("n").collect()
    // the late row (event 4) must NOT be counted — n stays 2
    assert(hour0.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("session_window closes a session after a 30-minute gap") {
    val out = runStream(Seq(
      Seq(Ev(1, t(0), 7, "click", 1.0), Ev(2, t(10), 7, "click", 1.0)),
      Seq(Ev(3, t(60), 7, "click", 1.0)), // > 30 min gap → new session
      Seq(Ev(4, t(240), 7, "click", 1.0)) // advance watermark, close both
    ), StreamOps.sessions, OutputMode.Append())
    val sessions = out.where("user_id = 7").orderBy("start")
      .select("n_events").collect().map(_.getLong(0)).toSeq
    // first session has events 1+2, second has event 3
    assert(sessions.take(2) == Seq(2L, 1L))
  }

  test("distinctUsers estimates per-window distinct users across micro-batches") {
    // 3 distinct users in hour 0 arriving over two micro-batches (user 1
    // repeats — the sketch must dedup across batches); at this cardinality
    // HLL is exact
    val out = runStream(Seq(
      Seq(Ev(1, t(5), 1, "click", 1.0), Ev(2, t(10), 2, "click", 1.0)),
      Seq(Ev(3, t(20), 1, "click", 1.0), Ev(4, t(25), 3, "click", 1.0)),
      Seq(Ev(5, t(300), 9, "click", 1.0)) // advance watermark, finalize hour 0
    ), StreamOps.distinctUsers, OutputMode.Append())
    val hour0 = out.where("ws = timestamp'2024-01-01 00:00:00'")
      .select("approx_users", "n").collect()
    assert(hour0.length == 1)
    assert(hour0.head.getLong(0) == 3L, s"sketch missed a cross-batch user: ${hour0.head}")
    assert(hour0.head.getLong(1) == 4L)
    // batch parity: the same definition on a batch frame agrees (tuples,
    // not Ev — Spark can't encode a test-class-scoped case class here)
    val batch = StreamOps.distinctUsers(Seq(
      (1L, t(5), 1L, "click", 1.0), (2L, t(10), 2L, "click", 1.0),
      (3L, t(20), 1L, "click", 1.0), (4L, t(25), 3L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .where("ws = timestamp'2024-01-01 00:00:00'")
      .select("approx_users").head().getLong(0)
    assert(batch == 3L)
  }

  test("keySkewMonitor reports per-window hot-user share across micro-batches") {
    // hour 0: user 1 fires 3 of 4 events (across two batches — the
    // chained aggs must merge cross-batch counts before the share)
    val out = runStream(Seq(
      Seq(Ev(1, t(5), 1, "click", 1.0), Ev(2, t(10), 2, "click", 1.0)),
      Seq(Ev(3, t(20), 1, "click", 1.0), Ev(4, t(25), 1, "click", 1.0)),
      Seq(Ev(5, t(300), 9, "click", 1.0)) // advance watermark, close hour 0
    ), StreamOps.keySkewMonitor, OutputMode.Append())
    val hour0 = out.where("ws = timestamp'2024-01-01 00:00:00'").collect()
    assert(hour0.length == 1)
    val r = hour0.head
    assert(r.getAs[Long]("n_users") == 2L && r.getAs[Long]("n_events") == 4L
      && r.getAs[Long]("max_cnt") == 3L)
    assert(r.getAs[Double]("top_share") == 0.75)
    // eff_users = 16 / (9 + 1) = 1.6 — the window "behaves like" 1.6 users
    assert(math.abs(r.getAs[Double]("eff_users") - 1.6) < 1e-12)
    // batch parity: identical definition over a batch frame
    val batch = StreamOps.keySkewMonitor(Seq(
      (1L, t(5), 1L, "click", 1.0), (2L, t(10), 2L, "click", 1.0),
      (3L, t(20), 1L, "click", 1.0), (4L, t(25), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .where("ws = timestamp'2024-01-01 00:00:00'").collect()
    assert(batch.length == 1 && batch.head.getAs[Double]("top_share") == 0.75)
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    val out = runStream(Seq(
      Seq(Ev(1, t(0), 1, "click", 1.0), Ev(1, t(1), 1, "click", 1.0)),
      Seq(Ev(2, t(2), 1, "view", 2.0), Ev(1, t(3), 1, "click", 1.0))
    ), StreamOps.dedup, OutputMode.Append())
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream interval join pairs purchases with same-user views within 10 min") {
    implicit val sc = spark.sqlContext
    val vm = MemoryStream[Ev]
    val pm = MemoryStream[Ev]
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = StreamOps.intervalJoin(vm.toDF(), pm.toDF()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    vm.addData(Ev(1, t(0), 1, "view", 1.0), Ev(2, t(0), 2, "view", 1.0))
    pm.addData(
      Ev(3, t(5), 1, "purchase", 5.0),  // same user, 5 min later → pair
      Ev(4, t(20), 1, "purchase", 9.0), // same user but 20 min later → no pair
      Ev(5, t(5), 3, "purchase", 1.0))  // no view for this user → no pair
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).select("user_id", "t_view", "t_buy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, t(0).getTime * 1000L, t(5).getTime * 1000L)))
  }

  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  test("lineDedupBlocks emits only first block occurrences across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = StreamOps.lineDedupBlocks(mem.toDF(), 2).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    mem.addData(Doc(t(0), 1L, "a b c d")) // blocks: "a b", "c d"
    q.processAllAvailable()
    mem.addData(Doc(t(1), 2L, "c d e f")) // "c d" already seen → only "e f"
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).select("doc_id", "blk", "btext").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set((1L, 0, "a b"), (1L, 1, "c d"), (2L, 1, "e f")))
  }

  test("outer interval join emits NULL for expired unmatched views and evicts state") {
    implicit val sc = spark.sqlContext
    val vm = MemoryStream[Ev]
    val pm = MemoryStream[Ev]
    sinkId += 1
    val name = s"sink_$sinkId"
    val q = StreamOps.intervalJoinOuter(vm.toDF(), pm.toDF()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    vm.addData(
      Ev(1, t(0), 1, "view", 1.0),  // matched by the t(5) purchase
      Ev(2, t(0), 2, "view", 1.0))  // never matched → NULL on expiry
    pm.addData(Ev(3, t(5), 1, "purchase", 5.0))
    q.processAllAvailable()
    // advance BOTH inputs' event time so the GLOBAL watermark (min over
    // inputs) passes t(0) + 10 min horizon + 10 min delay — only then can
    // Spark prove user 2's view has no future match and emit its null row
    vm.addData(Ev(6, t(60), 9, "view", 0.0))
    pm.addData(Ev(7, t(60), 9, "purchase", 0.0)) // in-horizon match at t(60)
    q.processAllAvailable()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set(
      (1L, t(0).getTime * 1000L, t(5).getTime * 1000L),  // inner match
      (2L, t(0).getTime * 1000L, -1L),                   // null emission
      (9L, t(60).getTime * 1000L, t(60).getTime * 1000L)))
    // state cleanup: after the watermark advance only the t(60) rows may
    // remain buffered — the t(0)/t(5) rows must be evicted (5 rows entered;
    // a leak would read >= 5)
    val lastState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
    q.stop()
    assert(lastState.exists(_ <= 4), s"join state not evicted: $lastState")
  }

  test("IdempotentUpsertSink: epoch fence skips re-delivery; replay is algebraically a no-op") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val empty = Seq.empty[(Long, Long, String, Long)]
      .toDF("event_id", "user_id", "event_type", "v")
    val sink = new StreamOps.IdempotentUpsertSink(empty, "event_id", "v")
    val q = mem.toDF()
      .select($"event_id", $"user_id", $"event_type",
        org.apache.spark.sql.functions.unix_micros($"ts").as("v"))
      .writeStream.foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.apply(df, id)).start()
    mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(0), 2, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(1, t(5), 1, "purchase", 2.0)) // same key, later version
    q.processAllAvailable()
    q.stop()
    def snapshot() = sink.current()
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val committed = snapshot()
    assert(committed == Set(
      (1L, "purchase", t(5).getTime * 1000L), (2L, "view", t(0).getTime * 1000L)))
    assert(sink.committedEpochs == 2)
    // layer 1 — epoch fence: re-delivering an already-committed batchId
    // (foreachBatch's at-least-once contract after a failure) is skipped
    val epoch1 = Seq((1L, 1L, "purchase", t(5).getTime * 1000L))
      .toDF("event_id", "user_id", "event_type", "v")
    sink.apply(epoch1, 1L)
    assert(sink.redeliveriesSkipped == 1 && snapshot() == committed)
    // layer 2 — fence lost (sink state rebuilt from an older snapshot):
    // replaying epoch 0's rows as a NEW epoch still changes nothing —
    // latest-wins upsert of already-reflected (or older) rows is a no-op
    val epoch0 = Seq((1L, 1L, "click", t(0).getTime * 1000L),
      (2L, 2L, "view", t(0).getTime * 1000L))
      .toDF("event_id", "user_id", "event_type", "v")
    sink.apply(epoch0, 2L)
    assert(snapshot() == committed)
    assert(sink.committedEpochs == 3)
  }

  test("streaming and batch tumbling forms agree on the events table") {
    val batch = StreamOps.tumbling(Tables(spark, sf, "events"))
    val viaQuery = SparkEntry.queries("stream_tumbling_agg")(spark, sf)
    // same number of (window × type) groups and same total count
    assert(batch.count() == viaQuery.count())
    val a = batch.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    val b = viaQuery.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(a == b)
  }
}
