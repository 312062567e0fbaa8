package graft.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Round 14 semantic pins for the Extras45 batch. */
class Round14cSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("events_growth_accounting: states partition actives; churn balances") {
    val rows = q("events_growth_accounting").collect()
      .sortBy(_.getAs[Long]("mi"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
        r.getAs[Long]("n_resurrected") == r.getAs[Long]("n_active"),
        s"new+retained+resurrected must partition the actives: $r")
    }
    assert(rows.head.getAs[Long]("n_new") == rows.head.getAs[Long]("n_active"),
      "on the first observed day every active user is new")
    // churned(d) = active(d−1) − retained(d) whenever d−1 is observed
    rows.sliding(2).foreach {
      case Array(p, c) if c.getAs[Long]("mi") == p.getAs[Long]("mi") + 1 =>
        assert(c.getAs[Long]("n_churned") ==
          p.getAs[Long]("n_active") - c.getAs[Long]("n_retained"),
          s"churn must balance: prev=$p cur=$c")
      case _ =>
    }
  }

  test("graph_component_sizes: sizes ≥ 2 and masses sum to the node count") {
    val rows = q("graph_component_sizes").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("sz") >= 2,
      "an edge-derived component has at least two nodes"))
    val mass = rows.map(r => r.getAs[Long]("sz") * r.getAs[Long]("n_components")).sum
    val nodes = {
      val e = graft.ops.Graph.strongEdgesCached(spark, sf)
      e.select(col("pa").as("u")).unionAll(e.select(col("pb").as("u")))
        .distinct().count()
    }
    assert(mass == nodes, s"component mass $mass must equal node count $nodes")
  }

  test("stats_wilcoxon_signed_rank matches a direct midrank recompute") {
    val r = q("stats_wilcoxon_signed_rank").collect()(0)
    // direct recompute of the paired differences and tie-averaged ranks
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val monthly = o.join(c, o("o_custkey") === c("c_custkey"))
      .where(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("c_nationkey"), year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("moy"))
      .agg(floor(sum(col("o_totalprice").cast("decimal(18,4)"))).cast("long")
        .as("rev"))
      .collect()
      .groupBy(x => (x.getAs[Int]("c_nationkey"), x.getAs[Int]("moy")))
    val ds = monthly.values.flatMap { rs =>
      val by = rs.map(x => x.getAs[Int]("yr") -> x.getAs[Long]("rev")).toMap
      for (a <- by.get(1996); b <- by.get(1997); if b - a != 0) yield b - a
    }.toSeq
    val sorted = ds.map(math.abs).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.size) }
    val wPlus = ds.filter(_ > 0).map(d => rankOf(math.abs(d))).sum
    assert(r.getAs[Long]("n_pairs") == ds.size)
    assert(math.abs(r.getAs[Double]("w_plus") - wPlus) < 1e-6,
      s"W+ ${r.getAs[Double]("w_plus")} vs direct $wPlus")
    assert(!r.getAs[Double]("z").isNaN)
  }
}
