package graft

import graft.functions.StringSimKernels
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck invariants for the round-8 third-session kernels:
  * Jaro-Winkler, ArrayPairs, the interval-overlap join, and
  * distributedRank. (Exact VALUE parity for JW is pinned against DuckDB
  * by the oracle gate and the 146k-pair pre-landing sweep; these are the
  * structural invariants.) */
object Round8cProps extends Properties("Round8cOps") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def jw(a: String, b: String): Double =
    StringSimKernels.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private val strGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString))

  property("jaroWinkler: range, identity, symmetry, empty rules") =
    Prop.forAll(strGen, strGen) { (a, b) =>
      val s = jw(a, b)
      s >= 0.0 && s <= 1.0 &&
        jw(a, b) == jw(b, a) &&
        (a.isEmpty || jw(a, a) == 1.0) &&
        (!(a.isEmpty || b.isEmpty) || s == 0.0)
    }

  // --- ArrayPairs: content == sorted-distinct combinations -------------

  private val arrGen: Gen[List[Long]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 20L)))

  property("ArrayPairs equals combinations(2) of the sorted distinct array") =
    Prop.forAll(Gen.listOfN(6, arrGen)) { arrays =>
      arrays.isEmpty || {
        val df = arrays.zipWithIndex.map { case (xs, i) => (i.toLong, xs) }
          .toDF("id", "xs")
          .withColumn("s", sort_array(array_distinct(col("xs"))))
          .withColumn("p", ColumnBridge.column(graft.functions.ArrayPairs(
            ColumnBridge.expression(col("s")))))
        val got = df.select(col("id"), col("p")).collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getLong(1))).toList
        }.toMap
        arrays.zipWithIndex.forall { case (xs, i) =>
          val want = xs.distinct.sorted.combinations(2)
            .map(c => (c(0), c(1))).toList
          got(i.toLong) == want
        }
      }
    }

  // --- overlapSelfJoin == theta join on random intervals ---------------

  private val ivGen: Gen[List[(Long, Long, Long)]] =
    Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 250L))))
      .map(_.zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) })

  property("overlapSelfJoin equals the theta join on random intervals") =
    Prop.forAll(ivGen) { ivs =>
      val df = ivs.toDF("id", "s", "e")
      val got = GraftOps.intervalOverlapSelfJoin(df, "id", Nil, "s", "e", 100L)
        .select("id_a", "id_b", "overlap_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toList
      val want = (for {
        (ia, sa, ea) <- ivs; (ib, sb, eb) <- ivs
        if ia < ib && sa < eb && sb < ea
      } yield (ia, ib, math.min(ea, eb) - math.max(sa, sb))).sorted.toList
      got == want
    }

  // --- distributedRank == row_number over the same total order ---------

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 9L)))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })

  property("distributedRank equals row_number over (value, id)") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("id", "v").repartition(5)
      val got = GraftOps.distributedRank(df, Seq("v", "id"), "rn")
        .select("id", "rn").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
      got == want
    }
}
