package graft

import graft.llm.Multimodal

/** The binary-column plumbing must survive a real distributed pass:
  * schema intact, features deterministic, executed via mapPartitions. */
class MultimodalSpec extends SparkSuite {

  test("assets carry binary payload + typed metadata struct") {
    val df = Multimodal.assets(spark, sf)
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val r = df.orderBy("doc_id").select("meta.n_bytes", "meta.format").head()
    assert(r.getLong(0) > 0 && r.getString(1) == "utf8")
  }

  test("extractFeatures runs the per-partition decode stub deterministically") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val rows = feats.orderBy("doc_id").limit(3).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length == 3 && f.head > 0) // n, mean, second moment
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
      .orderBy("doc_id").limit(3).collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq == again.map(_.getSeq[Float](1)).toSeq)
  }
}
