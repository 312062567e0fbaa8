package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted join must be result-equivalent to the plain join and must shuffle
  * on the composite (key, salt). */
class SkewSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of the fact rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 7) + 2L, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("k", "payload")
      .collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", 8).orderBy("k", "payload")
      .select("k", "payload", "name").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin tolerates map columns on the big side (hash() rejects maps)") {
    val big = (1 to 100).map(i => (i % 5L, i, Map("tag" -> s"v$i")))
      .toDF("k", "payload", "props")
    val small = (0L to 4L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .orderBy("k", "payload").collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", 4)
      .select("k", "payload", "name").orderBy("k", "payload").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val n = big.withColumn("__salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .groupBy("__salt").count().count()
    assert(n == 8) // all 8 salt buckets are populated for the single hot key
  }
}
