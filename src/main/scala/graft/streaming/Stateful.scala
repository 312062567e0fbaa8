package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.13 "stateful custom op": arbitrary per-key state beyond what windowed
  * aggregation expresses — here, per-user running purchase totals with an
  * emitted alert row each time the total crosses another multiple of the
  * threshold. flatMapGroupsWithState gives exactly-once state on the state
  * store; at 100 TB state is partitioned by user and bounded by timeout.
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
}
