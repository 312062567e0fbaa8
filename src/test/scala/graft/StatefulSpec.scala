package graft

import java.sql.Timestamp
import graft.streaming.Stateful
import graft.streaming.Stateful.Purchase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Custom per-key state via flatMapGroupsWithState: state persists across
  * micro-batches and alerts fire exactly when a threshold multiple is
  * crossed. */
class StatefulSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("spendAlerts keeps per-user running state across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Purchase]
    val q = Stateful.spendAlerts(mem.toDS(), threshold = 100.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    mem.addData(Purchase(1, t(0), 60.0), Purchase(2, t(1), 30.0))
    q.processAllAvailable()
    mem.addData(Purchase(1, t(2), 50.0)) // user 1 crosses 100 here
    q.processAllAvailable()
    mem.addData(Purchase(2, t(3), 40.0)) // user 2 still at 70 — no alert
    q.processAllAvailable()
    mem.addData(Purchase(1, t(4), 95.0)) // user 1 crosses 200
    q.processAllAvailable()
    q.stop()
    val out = spark.table("alerts").orderBy("total")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 110.0, 1L), (1L, 205.0, 2L)))
  }

  test("firstNPerUser admits only the first n rows per key across batches") {
    // transformWithState (arbitrary-state v2) requires the RocksDB state
    // store provider; set it for this stream and restore after — the
    // session is shared JVM-wide across suites.
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Purchase]
      val q = Stateful.firstNPerUser(mem.toDS(), n = 2)
        .writeStream.format("memory").queryName("firstn")
        .outputMode("append").start()
      mem.addData(Purchase(1, t(0), 10.0), Purchase(1, t(1), 11.0),
        Purchase(2, t(1), 20.0))
      q.processAllAvailable()
      // user 1 already used its quota of 2 — nothing more passes; user 2
      // has one admission left
      mem.addData(Purchase(1, t(2), 12.0), Purchase(2, t(3), 21.0),
        Purchase(2, t(4), 22.0))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("firstn").orderBy("user_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(out.toSeq == Seq((1L, 10.0), (1L, 11.0), (2L, 20.0), (2L, 21.0)))
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("quotaPerGroupStream: per-key caps persist across batches; absent=uncapped, <=0 drops") {
    import graft.streaming.Stateful.GroupDoc
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[GroupDoc]
      val q = Stateful.quotaPerGroupStream(mem.toDS(),
          Map("a" -> 2L, "b" -> 0L))
        .writeStream.format("memory").queryName("quota")
        .outputMode("append").start()
      mem.addData(GroupDoc("a", 1), GroupDoc("b", 2), GroupDoc("c", 3))
      q.processAllAvailable()
      // a has 1 admission left; b admits nothing ever; c is uncapped
      mem.addData(GroupDoc("a", 4), GroupDoc("a", 5), GroupDoc("b", 6),
        GroupDoc("c", 7))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("quota").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      // a admitted 2 of 3 (one of doc 4/5 — shuffle order within the
      // second batch picks which), b none, c all
      val (as, rest) = out.partition(_._1 == "a")
      assert(as.length == 2 && as.head._2 == 1L, out.mkString(", "))
      assert(rest.toSeq == Seq(("c", 3L), ("c", 7L)), out.mkString(", "))
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("quotaPerGroupStream reproduces batch quotaPerGroup under priority-ordered arrival") {
    import graft.streaming.Stateful.GroupDoc
    implicit val sc = spark.sqlContext
    // batch kernel selects each group's lowest-prio rows; stream admits
    // first-arrived. Feeding rows one micro-batch at a time in ascending
    // prio order makes the two selections provably identical.
    val rows = Seq(
      ("a", 10L, 100L), ("a", 20L, 101L), ("a", 30L, 102L), ("a", 40L, 103L),
      ("b", 15L, 200L), ("b", 25L, 201L),
      ("c", 11L, 300L), ("c", 21L, 301L), ("c", 31L, 302L))
    val quotas = Map("a" -> 2L, "c" -> 1L) // b uncapped
    val batchDf = rows.toDF("group", "prio", "doc_id")
    val quotasDf = quotas.toSeq.toDF("group", "quota")
    val expected = GraftOps.quotaPerGroup(batchDf, "group", "prio", quotasDf)
      .select("group", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[GroupDoc]
      val q = Stateful.quotaPerGroupStream(mem.toDS(), quotas)
        .writeStream.format("memory").queryName("quotaparity")
        .outputMode("append").start()
      // one row per micro-batch = strict arrival order, no intra-batch
      // shuffle nondeterminism
      rows.sortBy(_._2).foreach { case (g, _, id) =>
        mem.addData(GroupDoc(g, id)); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("quotaparity").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"stream $got vs batch $expected")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("driftMonitorStream: cumulative state, verdict flips when the stream drifts") {
    import graft.streaming.Stateful.BucketObs
    implicit val sc = spark.sqlContext
    val ref = Map(0 -> 10L, 1 -> 10L)
    val mem = MemoryStream[BucketObs]
    val q = Stateful.driftMonitorStream(mem.toDS(), ref, 10)
      .writeStream.format("memory").queryName("driftmon")
      .outputMode("update").start()
    // batch 1: the stream mirrors the reference shape → stable
    mem.addData((Seq.fill(5)(0) ++ Seq.fill(5)(1)).map(BucketObs("k", _)): _*)
    q.processAllAvailable()
    // batch 2: all new mass lands in an unseen bucket → drifted
    mem.addData(Seq.fill(40)(9).map(BucketObs("k", _)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("driftmon").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 50L), rows.mkString(", "))
    assert(!rows(0)._3, s"balanced prefix flagged drifted: ${rows(0)}")
    assert(rows(1)._3, s"drifted stream not flagged: ${rows(1)}")
    // the emitted verdict IS the shared kernel over the cumulative state
    val (psi2, _, drifted2, t2) = graft.clean.ProfileQueries.DriftMath.psiKs(
      ref, Map(0 -> 5L, 1 -> 5L, 9 -> 40L), 10)
    assert(rows(1) == ((t2, psi2, drifted2)), s"${rows(1)} vs ($t2, $psi2, $drifted2)")
  }

  test("approxTopValuesStream: MG state persists across batches, guarantees hold") {
    import graft.streaming.Stateful.GroupValue
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[GroupValue]
    val q = Stateful.approxTopValuesStream(mem.toDS(), capacity = 4, k = 2)
      .writeStream.format("memory").queryName("topvals")
      .outputMode("update").start()
    // batch 1: hot=5, a..d 1 each (9 rows, group g)
    mem.addData(
      (Seq.fill(5)("hot") ++ Seq("a", "b", "c", "d")).map(GroupValue("g", _)): _*)
    q.processAllAvailable()
    // batch 2: hot surges further, warm appears 4 times (stream total 19)
    mem.addData(
      (Seq.fill(6)("hot") ++ Seq.fill(4)("warm")).map(GroupValue("g", _)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topvals").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // after batch 1: hot is rank 1 with est in [5 - 9/5, 5]
    val b1Top = rows.filter(r => r._4 == 1 && r._3 <= 5)
    assert(b1Top.exists(_._2 == "hot"), rows.mkString(", "))
    // after batch 2 (last emission): n=19, slack = 19/5 = 3.8 →
    // hot (11) and warm (4) are the only possible top-2; hot must lead
    // with est in [11 - 3.8, 11]
    val last = rows.filter(_._3 > 5)
    assert(last.nonEmpty, "second batch emitted nothing above batch-1 counts")
    val hotLast = last.find(_._2 == "hot").get
    assert(hotLast._4 == 1 && hotLast._3 >= 8 && hotLast._3 <= 11,
      s"cross-batch MG estimate broken: $hotLast")
  }

  test("scd2Stream closes versions across micro-batches and matches batch scd2History") {
    import graft.streaming.Stateful.Scd2Change
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      val b1 = Seq(Scd2Change("k1", t(0), "a"))
      val b2 = Seq(Scd2Change("k1", t(2), "c"), Scd2Change("k1", t(1), "b"),
        Scd2Change("k2", t(1), "z"))
      val mem = MemoryStream[Scd2Change]
      val q = Stateful.scd2Stream(mem.toDS())
        .writeStream.format("memory").queryName("scd2")
        .outputMode("append").start()
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable() // in-batch sort orders b before c
      q.stop()
      val closed = spark.table("scd2").collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3)))
        .sortBy(x => (x._1, x._3.getTime))
      assert(closed.toSeq == Seq(
        ("k1", "a", t(0), t(1)), ("k1", "b", t(1), t(2))))
      // batch parity on the SAME history: closed streaming rows ==
      // batch scd2History rows whose interval is closed
      import spark.implicits._
      val batch = graft.ops.Extras6.scd2History(
        (b1 ++ b2).toDF("key", "ts", "attr"), "key", "ts", Nil)
        .where(org.apache.spark.sql.functions.col("valid_to").isNotNull)
        .select("key", "attr", "valid_from", "valid_to")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3)))
        .sortBy(x => (x._1, x._3.getTime))
      assert(batch.toSeq == closed.toSeq)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ewmaStream: exact recursion across micro-batches, within truncation tail of batch") {
    import graft.streaming.Stateful.DayValue
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the declared query's own daily series (user, day, day_value, ewma)
      val batchOut = SparkEntry.queries("timeseries_ewma")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
      val rows = batchOut.map(x => DayValue(x._1, x._2, x._3)).sortBy(_.day)
      val days = rows.map(_.day).distinct.sorted
      val (b1, b2) = rows.partition(_.day < days(days.length / 2))
      val mem = MemoryStream[DayValue]
      val q = Stateful.ewmaStream(mem.toDS())
        .writeStream.format("memory").queryName("ewma_s")
        .outputMode("append").start()
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()
      val got = spark.table("ewma_s").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      // 1) EXACTLY the sequential recursion y = (y + x)/2 per user
      val ref = rows.groupBy(_.user_id).toSeq.flatMap { case (u, rs) =>
        var y = 0.0
        rs.sortBy(_.day).toSeq.map { r => y = (y + r.value) / 2.0; (u, r.day) -> y }
      }.toMap
      assert(ref.size == got.size)
      ref.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
      // 2) within the truncation tail of the DECLARED batch query:
      //    |recursive - 8-lag truncated| <= max|x| / 256 (+ tiny decimal
      //    vs double arithmetic noise on the shared prefix terms)
      val maxAbs = rows.map(r => math.abs(r.value)).max
      val tol = maxAbs / 256.0 + 1e-9
      batchOut.foreach { case (u, day, _, ewmaBatch) =>
        assert(math.abs(got((u, day)) - ewmaBatch) <= tol,
          s"($u,$day): stream ${got((u, day))} vs batch $ewmaBatch tol $tol")
      }
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("featureAsofStream matches the batch RANGE-frame semantics across batches") {
    import graft.streaming.Stateful.{UserEvent, FeatureRow}
    implicit val sc = spark.sqlContext
    val H = 3600000000L
    val mem = MemoryStream[UserEvent]
    val q = Stateful.featureAsofStream(mem.toDS())
      .writeStream.format("memory").queryName("feat")
      .outputMode("append").start()
    // user 1: clicks at t0, t0+30m, view at t0+50m, purchase at t0+55m
    val t0 = 1700000000000000L
    mem.addData(
      UserEvent(1, t0, "click", 10),
      UserEvent(1, t0 + 30 * 60 * 1000000L, "click", 20),
      UserEvent(1, t0 + 50 * 60 * 1000000L, "view", 30))
    q.processAllAvailable()
    // second batch: the purchase sees state from the FIRST batch
    mem.addData(UserEvent(1, t0 + 55 * 60 * 1000000L, "purchase", 40))
    q.processAllAvailable()
    // third: 25h later, everything evicted; same-us click must NOT count
    val t1 = t0 + 25 * H
    mem.addData(UserEvent(1, t1, "click", 5), UserEvent(1, t1, "purchase", 7))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("feat").orderBy("us")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // purchase 1: 2 clicks in 1h, 3 events in 24h, vsum 60
    assert(out(0) == ((2L, 3L, 60L)), s"got ${out.toSeq}")
    // purchase 2: the same-us click is excluded (strictly-before frame)
    assert(out(1) == ((0L, 0L, 0L)), s"got ${out.toSeq}")

    // parity with the declared batch query's window algebra on the same rows
    val rows = Seq(
      (1L, t0, "click", 10L), (1L, t0 + 30 * 60 * 1000000L, "click", 20L),
      (1L, t0 + 50 * 60 * 1000000L, "view", 30L),
      (1L, t0 + 55 * 60 * 1000000L, "purchase", 40L),
      (1L, t1, "click", 5L), (1L, t1, "purchase", 7L))
      .toDF("user_id", "us", "event_type", "vq")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w1 = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600000000L, -1L)
    val w24 = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-86400000000L, -1L)
    val batch = rows
      .withColumn("c1", sum(when(col("event_type") === "click", 1L)
        .otherwise(0L)).over(w1))
      .withColumn("e24", count(lit(1)).over(w24))
      .withColumn("v24", sum(col("vq")).over(w24))
      .where(col("event_type") === "purchase")
      .orderBy("us")
      .collect().map(r => (
        java.lang.Long.valueOf(if (r.isNullAt(4)) 0L else r.getLong(4)).longValue,
        r.getLong(5),
        if (r.isNullAt(6)) 0L else r.getLong(6)))
    assert(batch.toSeq == out.toSeq, s"stream ${out.toSeq} != batch ${batch.toSeq}")
  }

  test("transitionPairsStream equals the batch lag across micro-batches") {
    import graft.streaming.Stateful.UserEvent
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Stateful.transitionPairsStream(mem.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    val t0 = 1700000000000000L
    def ev(u: Long, k: Int, t: String) = UserEvent(u, t0 + k * 1000000L, t, 0L)
    mem.addData(ev(1, 0, "view"), ev(1, 1, "click"), ev(2, 0, "signup"))
    q.processAllAvailable()
    // batch boundary: user 1's next transition must use state (click)
    mem.addData(ev(1, 2, "purchase"), ev(2, 1, "view"), ev(2, 2, "view"))
    q.processAllAvailable()
    // same-us tie: EVENT_ID breaks it (the batch lag window's sort key),
    // not event_type — "zebra" (id 1) precedes "apple" (id 2)
    mem.addData(
      UserEvent(3, t0 + 5000000L, "zebra", 0L, event_id = 1L),
      UserEvent(3, t0 + 5000000L, "apple", 0L, event_id = 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans")
      .groupBy("from_type", "to_type").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Map(
      ("view", "click") -> 1L, ("click", "purchase") -> 1L,
      ("signup", "view") -> 1L, ("view", "view") -> 1L,
      ("zebra", "apple") -> 1L)
    assert(got == expected, s"got $got")
  }

  test("burstinessStream: final snapshot bit-equal to the declared batch query") {
    import graft.streaming.Stateful.UserEvent
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    // the real corpus, in event-time order, split into 3 micro-batches
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"))
      .collect()
      .map(r => UserEvent(r.getLong(0), r.getLong(1) * 1000000L, "e", 0L,
        r.getLong(2)))
      .sortBy(e => (e.us, e.event_id))
    val thirds = ev.grouped(math.max(1, (ev.length + 2) / 3)).toSeq
    val mem = MemoryStream[UserEvent]
    val q = Stateful.burstinessStream(mem.toDS())
      .writeStream.format("memory").queryName("burst_s")
      .outputMode("append").start()
    thirds.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    // last emitted snapshot per user (batchId-free: Append emits one row
    // per (user, batch) with monotone n_gaps — max n_gaps wins)
    val got = spark.table("burst_s").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    val batch = SparkEntry.queries("events_inter_arrival_burstiness")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getAs[Double]("mean_gap_s"),
        r.getAs[Double]("std_gap_s"), r.getAs[Double]("burstiness")))).toMap
    assert(batch.nonEmpty && got.keySet == batch.keySet,
      s"users: stream=${got.size} batch=${batch.size}")
    batch.foreach { case (u, b) =>
      assert(got(u) == b, s"user $u: stream ${got(u)} != batch $b")
    }
  }
}
