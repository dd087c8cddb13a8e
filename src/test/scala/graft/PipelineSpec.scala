package graft

import graft.queries.{Pipeline, TextVec}
import org.apache.spark.sql.functions._

/** Pipeline-operator specs: ANN recall vs exact top-k, SimHash pair
  * properties, fingerprint determinism, multimodal plumbing shape.
  */
class PipelineSpec extends SparkSpec {

  test("q29 SRP-LSH ANN recall vs exact q16 top-5 >= 0.4") {
    val exact = TextVec.q16(spark, sf001).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Pipeline.q29(spark, sf001).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(f"ANN recall = $recall%.2f (${(exact & ann).size}/${exact.size})")
    assert(recall >= 0.4, f"recall $recall%.2f below 0.4")
  }

  test("q27 simhash pairs: all hamming <= 3 and include exact duplicates") {
    val pairs = Pipeline.q27(spark, sf001).collect()
    assert(pairs.forall(_.getInt(2) <= 3))
    // exact text duplicates (Jaccard 1.0 pairs from q15) must be hamming 0
    val exactDups = TextVec.q15(spark, sf001).filter(col("j") === 1.0)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDups.subsetOf(found),
      s"missing exact dups: ${exactDups -- found}")
  }

  test("q24 fingerprint: deterministic, stable across runs, distinct-ish") {
    val a = Pipeline.q24(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Pipeline.q24(spark, sf0001).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    val nDistinctFp = a.map(_._2).distinct.length
    val nDistinctText = Tables.documents(spark, sf0001)
      .select(countDistinct(col("text"))).head.getLong(0)
    assert(nDistinctFp == nDistinctText.toInt,
      s"fingerprint collisions or misses: $nDistinctFp fp vs $nDistinctText texts")
  }

  test("q23/q25/q26 shapes and invariants") {
    val stats = Pipeline.q23(spark, sf0001)
    assert(stats.filter(col("n_tok") > col("n_char")).count() == 0)
    val langs = Pipeline.q25(spark, sf0001).collect()
    assert(langs.nonEmpty)
    val quality = Pipeline.q26(spark, sf0001).collect()
    assert(quality.forall { r =>
      val q = r.getDouble(2); q >= 0.0 && q <= 1.0
    })
  }

  test("q31 multimodal decode stub: metadata struct populated per row") {
    val mm = Pipeline.mmDecodeStub(spark, sf0001)
    val rows = mm.collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    assert(rows.forall { r =>
      val meta = r.getStruct(2)
      meta.getInt(0) >= 1 && meta.getInt(0) <= 1920 &&
        meta.getInt(1) >= 1 && meta.getInt(1) <= 1080
    })
  }
}
