package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck invariants for the round-8 second-session operators:
  * line-level dedup, SCD2 history, and the k-means Lloyd step. */
object Round8Props extends Properties("Round8Ops") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  // --- lineDedup: every distinct block text survives exactly once ------

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(10, Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def modelBlocks(text: String, bw: Int): List[String] =
    text.split(" ").grouped(bw).map(_.mkString(" ")).toList

  property("lineDedup keeps each distinct block exactly once, counts all") =
    Prop.forAll(docsGen) { docs =>
      docs.isEmpty || {
        val bw = 2
        val out = llm.LineDedup.lineDedup(docs.toDF("doc_id", "text"), bw)
          .agg(sum(col("n_kept")), sum(col("n_blocks"))).head()
        val all = docs.flatMap { case (_, t) => modelBlocks(t, bw) }
        out.getLong(0) == all.distinct.size.toLong &&
          out.getLong(1) == all.size.toLong
      }
    }

  // --- scd2History: intervals chain and exactly one current per key ----

  private val changesGen: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(18, Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf("a", "b", "c")))
      .map(_.zipWithIndex.map { case ((k, a), i) => (k, i, a) })

  property("scd2History: intervals chain per key, exactly one open version") =
    Prop.forAll(changesGen) { changes =>
      changes.isEmpty || {
        val df = changes.toDF("k", "seq", "attr")
          .withColumn("ts", timestamp_seconds(col("seq")))
        val hist = ops.Extras6.scd2History(df, "k", "ts", Nil)
          .select(col("k"), col("seq"), col("valid_to"), col("is_current"))
          .collect().map(r => (r.getLong(0), r.getInt(1),
            Option(r.getTimestamp(2)), r.getBoolean(3)))
        val perKey = hist.groupBy(_._1).values
        hist.length == changes.length && perKey.forall { vs =>
          val sorted = vs.sortBy(_._2)
          sorted.count(_._4) == 1 && sorted.last._4 &&
            sorted.init.forall(_._3.isDefined) && sorted.last._3.isEmpty
        }
      }
    }

  // --- kmeansUpdate: every vector counted exactly once per position ----

  private val vecsGen: Gen[List[Array[Double]]] =
    Gen.listOfN(20, Gen.listOfN(3, Gen.chooseNum(-1.0, 1.0)).map(_.toArray))

  property("kmeansUpdate: member counts per position sum to N") =
    Prop.forAll(vecsGen) { vs =>
      vs.isEmpty || {
        val vecs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "v")
        val cents = Seq((1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)))
          .toDF("cid", "cv")
        val perPos = llm.Similarity.kmeansUpdate(vecs, cents)
          .groupBy(col("pos")).agg(sum(col("n_members")).as("n"))
          .select("n").as[Long].collect()
        perPos.length == 3 && perPos.forall(_ == vs.size.toLong)
      }
    }
}
