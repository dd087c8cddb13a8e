package graft

import graft.queries.TextVec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** LSH near-dup: the banded MinHash candidate stage must not lose any pair
  * the brute-force exact-Jaccard reference finds (recall 1.0 on this corpus
  * — the planted dups are all J >= 0.92, far above the 0.6 band threshold).
  */
class NearDupSpec extends SparkSpec {

  test("q15 LSH+verify equals brute-force exact Jaccard at sf0.001") {
    val lsh = TextVec.q15(spark, sf0001).collect().toSeq
    val brute = TextVec.nearDupBrute(spark, sf0001).collect().toSeq
    assert(lsh == brute)
    assert(brute.nonEmpty, "corpus should contain planted near-dups")
  }

  test("dedup idempotence: distinct of distinct is distinct") {
    val docs = Tables.documents(spark, sf0001)
      .select(lower(trim(col("text"))).as("t"))
    val once = docs.distinct()
    assert(once.count() == once.distinct().count())
  }

  test("shingles: short and empty texts yield empty sets") {
    import spark.implicits._
    val df = Seq("", "short", "exactly8", "longer than eight").toDF("text")
      .select(size(shingles(col("text"), 8)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 1, 10))
  }

  test("jaccard is 1.0 for identical sets, 0 intersection for disjoint") {
    import spark.implicits._
    val df = Seq(("abcdefgh", "abcdefgh"), ("aaaaaaaa", "bbbbbbbb")).toDF("x", "y")
      .select(jaccard(shingles(col("x"), 8), shingles(col("y"), 8)).as("j"))
    val js = df.collect().map(_.getDouble(0)).toSeq
    assert(js == Seq(1.0, 0.0))
  }
}
