package graft

import java.sql.Timestamp
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

/** Round-12 state-store soak (VERDICT r11 item 6): the chained-stateful
  * twins (keySkewMonitor — two event-time aggregations in sequence — and
  * lineDedupBlocks) run for 120+ micro-batches on the ROCKSDB state
  * store with continuous watermark-lateness injection, asserting
  *  - BOUNDED STATE: stateOperators.numRowsTotal stays pinned to the
  *    open-window/horizon working set, it does not grow with batch
  *    count (the leak a 100-day production stream would hit);
  *  - LATE-DROP + PARITY: after a final watermark push closes every
  *    window, the appended output equals the same definition run as a
  *    BATCH frame over exactly the watermark-retained events.
  *
  * StreamingSpec pins 2-3-batch semantics on the default HDFS-backed
  * store; this suite is the long-haul twin on the store a production
  * deployment would configure.
  */
object StreamSoakSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}

class StreamSoakSpec extends SparkSuite {
  import TestSpark.spark.implicits._
  import StreamSoakSpec.{Ev, Doc}

  private def ts(minutes: Long): Timestamp = new Timestamp(
    Timestamp.valueOf("2024-01-01 00:00:00").getTime + minutes * 60000L)

  private def withRocksDB[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("keySkewMonitor soaks 120 micro-batches on RocksDB: bounded state, late drops, batch parity") {
    withRocksDB {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Ev]
      val ckpt = Tables.scratchDir("soak_skew", "mem") + "_ckpt"
      val q = StreamOps.keySkewMonitor(mem.toDF()).writeStream
        .format("memory").queryName("soak_skew")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

      // 120 batches, event time advancing 5 min/batch: ~1-2 open 1h
      // windows at any moment, 10-min watermark. Each batch: 10 on-time
      // events over 5 users (user 1 hot: 6/10) + 2 LATE events 40 min
      // behind the running max (beyond the watermark once it moves).
      var eid = 0L
      def mkBatch(b: Int): Seq[Ev] = {
        val base = b * 5L
        val onTime = (0 until 10).map { i =>
          eid += 1
          Ev(eid, ts(base + (i % 3)), if (i < 6) 1L else (i % 5).toLong + 2L,
            "click", 1.0)
        }
        val late = (0 until 2).map { i =>
          eid += 1
          Ev(eid, ts(math.max(0L, base - 40L) + i), 9L, "late", 1.0)
        }
        onTime ++ late
      }
      // watermark simulation for the parity set: Spark finalizes a 1h
      // window once watermark (max event time so far - 10 min) passes
      // its end; a row is DROPPED if its window end <= watermark at its
      // processing batch. Track retained rows exactly.
      var maxSeenMin = Long.MinValue
      val retained = Seq.newBuilder[Ev]
      var maxState = 0L
      var stateAtMid = -1L
      val batches = 120
      (0 until batches).foreach { b =>
        val batch = mkBatch(b)
        val wmMin = if (maxSeenMin == Long.MinValue) Long.MinValue
          else maxSeenMin - 10L
        batch.foreach { e =>
          val evMin = (e.ts.getTime -
            Timestamp.valueOf("2024-01-01 00:00:00").getTime) / 60000L
          val winEnd = (evMin / 60L + 1L) * 60L
          if (wmMin == Long.MinValue || winEnd > wmMin) retained += e
          maxSeenMin = math.max(maxSeenMin, evMin)
        }
        mem.addData(batch)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          val rows = p.stateOperators.map(_.numRowsTotal).sum
          maxState = math.max(maxState, rows)
          if (b == batches / 2) stateAtMid = rows
        }
      }
      // final push: one event far in the future closes every window
      val closer = { eid += 1; Ev(eid, ts(batches * 5L + 24 * 60L), 1L, "x", 1.0) }
      val closerMin = batches * 5L + 24 * 60L
      retained += closer
      maxSeenMin = math.max(maxSeenMin, closerMin)
      mem.addData(Seq(closer))
      q.processAllAvailable()
      mem.addData(Seq({ eid += 1
        Ev(eid, ts(closerMin + 24 * 60L), 1L, "x", 1.0) }))
      q.processAllAvailable()
      val finalState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"skew soak state: mid=$stateAtMid max=$maxState final=$finalState")

      // BOUNDED: working set = (open windows x <=6 users) per operator.
      // 120 batches saw ~12 windows x 6 users = ~720 distinct keys pass
      // through; state must hold only the open-horizon slice of them.
      assert(maxState <= 60,
        s"state grew past the open-window working set: max=$maxState")
      assert(stateAtMid > 0 && maxState <= stateAtMid + 30,
        s"state kept growing after steady state: mid=$stateAtMid max=$maxState")
      assert(finalState <= 30, s"state not reclaimed after close: $finalState")

      // PARITY: append output (closed 1h windows) == batch twin over the
      // retained events, for every window the final watermark closed.
      val finalWmMin = maxSeenMin - 10L
      // ws minutes relative to the fixture epoch (2024-01-01), matching
      // the mkBatch/watermark bookkeeping above
      val epochMin = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 60000L
      val closedWs = unix_timestamp(col("ws")) / 60 - epochMin + 60 <= finalWmMin
      val expected = StreamOps.keySkewMonitor(retained.result().toDF())
        .where(closedWs)
      val got = spark.table("soak_skew")
      val exp = expected.orderBy("ws").collect().map(_.toSeq).toSeq
      val act = got.where(closedWs)
        .orderBy("ws").collect().map(_.toSeq).toSeq
      assert(act == exp,
        s"soak output diverged from batch twin:\n got ${act.take(5)}\nwant ${exp.take(5)}")
      assert(act.size >= 10, s"soak closed too few windows: ${act.size}")
    }
  }

  test("lineDedupBlocks soaks 120 micro-batches on RocksDB: bounded state, horizon dedup") {
    withRocksDB {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Doc]
      val ckpt = Tables.scratchDir("soak_line", "mem") + "_ckpt"
      val q = StreamOps.lineDedupBlocks(mem.toDF(), 2).writeStream
        .format("memory").queryName("soak_line")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()

      // pool of 8 recurring 2-word blocks (boilerplate) + 1 fresh block
      // per doc; event time advances 5 min/batch, 10-min watermark, so
      // the dedup horizon holds ~3 batches' distinct blocks at a time
      var did = 0L
      var maxState = 0L
      var stateAtMid = -1L
      val batches = 120
      (0 until batches).foreach { b =>
        val docs = (0 until 4).map { i =>
          did += 1
          val boiler = s"pool${(b + i) % 8}a pool${(b + i) % 8}b"
          Doc(did, ts(b * 5L), s"$boiler fresh${did}a fresh${did}b")
        }
        mem.addData(docs)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          val rows = p.stateOperators.map(_.numRowsTotal).sum
          maxState = math.max(maxState, rows)
          if (b == batches / 2) stateAtMid = rows
        }
      }
      q.stop()
      info(s"line soak state: mid=$stateAtMid max=$maxState")
      // horizon working set: <=3 batches x (<=8 pool + 4 fresh) blocks;
      // 120 batches produced ~500 distinct fresh blocks total — state
      // holding them all would read ~500+
      assert(maxState <= 80,
        s"dedup state grew past the watermark horizon: max=$maxState")
      assert(stateAtMid > 0 && maxState <= stateAtMid + 40,
        s"dedup state kept growing: mid=$stateAtMid max=$maxState")

      val out = spark.table("soak_line")
      // every fresh block is globally unique -> appears exactly once
      val freshDups = out.where(col("btext").contains("fresh"))
        .groupBy("btext").count().where(col("count") > 1).count()
      assert(freshDups == 0, s"$freshDups fresh blocks emitted twice")
      // pool blocks recur every 8 batches = 40 min > horizon, so they
      // re-emit after eviction — but never twice WITHIN a horizon: any
      // two emissions of the same btext are > 10 min apart
      // driver-side pair check (a few hundred rows; a memory-sink self-
      // join trips conflicting-reference resolution)
      val pool = out.where(col("btext").contains("pool"))
        .select(col("btext"), unix_timestamp(col("ts")).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val close = pool.groupBy(_._1).valuesIterator.map { emits =>
        val ts2 = emits.map(_._2).sorted.toSeq
        ts2.zip(ts2.drop(1)).count { case (a, b) => b - a < 600 }
      }.sum
      assert(close == 0, s"$close duplicate pool-block pairs within the horizon")
      assert(out.count() >= 480, "soak emitted too few blocks")
    }
  }
}
