package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** §2.13 "stateful custom op": arbitrary per-key state beyond what windowed
  * aggregation expresses — here, per-user running purchase totals with an
  * emitted alert row each time the total crosses another multiple of the
  * threshold. flatMapGroupsWithState gives exactly-once state on the state
  * store; at 100 TB state is partitioned by user and bounded by timeout.
  *
  * [[firstNPerUser]] demonstrates the Spark 4 arbitrary-state v2 API
  * (`transformWithState` + [[StatefulProcessor]] + typed [[ValueState]]):
  * a per-key admission quota — only the first `n` rows of each key ever
  * pass, across ALL micro-batches. The v2 API needs the RocksDB state
  * store provider (`spark.sql.streaming.stateStore.providerClass`);
  * state here is one long per key, TTL-able via [[TTLConfig]] when keys
  * churn (set NONE for the bounded test corpus).
  */
object Stateful {

  case class Purchase(user_id: Long, ts: Timestamp, value: Double)
  case class SpendAlert(user_id: Long, total: Double, alerts_crossed: Long)

  /** Emits an alert whenever a user's cumulative value crosses a new
    * multiple of `threshold`. Works on a streaming OR batch Dataset. */
  def spendAlerts(purchases: Dataset[Purchase], threshold: Double): Dataset[SpendAlert] = {
    implicit val encA = Encoders.product[SpendAlert]
    implicit val encD = Encoders.scalaDouble
    purchases
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Double, SpendAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Purchase], state: GroupState[Double]) =>
          val before = state.getOption.getOrElse(0.0)
          val added = rows.map(_.value).sum
          val after = before + added
          state.update(after)
          val crossedBefore = (before / threshold).toLong
          val crossedAfter = (after / threshold).toLong
          if (crossedAfter > crossedBefore)
            Iterator(SpendAlert(user, after, crossedAfter))
          else Iterator.empty
      }
  }

  /** v2 arbitrary-state processor: admit the first `n` rows per key.
    * The running admit-count survives micro-batches in a typed
    * [[ValueState]] on the (RocksDB) state store. */
  private class FirstNProcessor(n: Int)
      extends StatefulProcessor[Long, Purchase, Purchase] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Purchase],
        timers: TimerValues): Iterator[Purchase] = {
      var seen = if (count.exists()) count.get() else 0L
      val out = scala.collection.mutable.ListBuffer.empty[Purchase]
      rows.foreach { r => if (seen < n) { seen += 1; out += r } }
      count.update(seen)
      out.iterator
    }
  }

  /** PUBLIC API: per-user admission quota over a stream — passes each
    * user's first `n` purchases and drops the rest, across all
    * micro-batches (streaming keep-first dedup with a budget: sampling
    * caps, free-tier limits, at-most-n training examples per source). */
  def firstNPerUser(purchases: Dataset[Purchase], n: Int): Dataset[Purchase] = {
    implicit val encP = Encoders.product[Purchase]
    purchases
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FirstNProcessor(n), TimeMode.None(),
        OutputMode.Append())
  }
}
