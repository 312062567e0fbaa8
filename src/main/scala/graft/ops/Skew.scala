package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈dim joins where AQE's skew-join can't help
  * (e.g. a single hot key that still overflows one task after splitting).
  *
  * Salting: the big side gets a deterministic salt in [0, salt) derived by
  * hashing the whole row (content-stable — no rand(), so replays and
  * retries see the same salt); the small side is replicated `salt` times;
  * the join key becomes (key, salt), spreading each hot key over `salt`
  * tasks. Row-content hashing keeps identical duplicate rows together,
  * which is irrelevant for correctness and fine for balance.
  */
object Skew {

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full outer would emit `salt` null-padded copies of every
    // unmatched small-side row (it was replicated) — reject those types.
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(ok.contains(joinType.toLowerCase.replace("_", "")) ||
      ok.contains(joinType.toLowerCase),
      s"saltedJoin does not support join type '$joinType' (small side is replicated)")
    // hash() rejects MapType columns — hash only the hashable ones (there
    // is always at least the join key); content-stable either way
    val hashable = big.schema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    val bigS = big.withColumn("__salt",
      pmod(hash(hashable.toSeq: _*), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
