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
}
