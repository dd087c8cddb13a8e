package graft

import graft.queries.Pipeline
import org.apache.spark.sql.Row

/** q77 (unigram rarity), q78 (duplicated-span census), q79 (cross-source
  * span overlap). The q78/q79 hashed-shingle forms are held to full
  * row-equality with their string-shingle reference forms (the oracle's
  * construction) — the q62 pattern: any hash collision or dedup-semantics
  * drift breaks equality, not just a count.
  */
class SpanDupSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  test("q78 hashed-shingle census equals the string-shingle reference form") {
    assert(rows(Pipeline.q78(spark, sf001)) == rows(Pipeline.q78StringShingles(spark, sf001)))
  }

  test("q79 hashed-shingle overlap equals the string-shingle reference form") {
    assert(rows(Pipeline.q79(spark, sf001)) == rows(Pipeline.q79StringShingles(spark, sf001)))
  }

  test("q78 census invariants: flags bounded by doc counts, zero-span sources have zero dup docs") {
    val census = rows(Pipeline.q78(spark, sf001))
    assert(census.nonEmpty)
    census.foreach { r =>
      val (nDocs, nDupDocs, nSpans) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDupDocs <= nDocs, s"source ${r.getString(0)}: $nDupDocs dup docs > $nDocs docs")
      assert((nSpans == 0) == (nDupDocs == 0),
        s"source ${r.getString(0)}: spans=$nSpans but dupDocs=$nDupDocs")
    }
  }

  test("q79 overlap invariants: ordered pairs, jaccard in (0,1], symmetric with q78's span universe") {
    val pairs = rows(Pipeline.q79(spark, sf001))
    pairs.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
      assert(r.getLong(2) > 0)
    }
  }

  test("q80 budget selection: equals the naive single-window formulation, budget respected") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    // Naive reference: ONE un-bucketed running-sum window over the whole
    // corpus (the formulation that would serialize at 100 TB). The
    // two-pass bucketed prefix sum must select the exact same documents.
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        TextFunctions.qualityScore(col("text")).as("q"))
    val bud = d.agg(expr("sum(n_tok) div 2")).head().getLong(0)
    val w = Window.orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("cum", sum("n_tok").over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum") <= bud, 1L).otherwise(0L)).as("n_sel"),
        sum(when(col("cum") <= bud, col("n_tok")).otherwise(0L)).as("tok_sel"))
      .orderBy("source")
    assert(rows(Pipeline.q80(spark, sf001)) == rows(naive))
    // global budget actually binds: selected tokens fit, and adding any
    // one unselected doc's tokens would overflow is implied by the greedy
    // prefix construction — here just pin the budget bound itself
    val totSel = rows(Pipeline.q80(spark, sf001)).map(_.getLong(3)).sum
    assert(totSel <= bud && totSel > 0)
  }

  test("q81 funnel: per-source monotone stages, dedup matches distinct prefixes, budget binds") {
    import org.apache.spark.sql.functions._
    val out = rows(Pipeline.q81(spark, sf001))
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nd, d1, d2, d3) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd >= d1 && d1 >= d2 && d2 >= d3,
        s"source ${r.getString(0)}: funnel not monotone ($nd, $d1, $d2, $d3)")
    }
    // stage-1 total equals the distinct normalized-prefix count
    val distinctPfx = Tables.documents(spark, sf001)
      .select(substring(lower(trim(col("text"))), 1, 200)).distinct().count()
    assert(out.map(_.getLong(2)).sum == distinctPfx)
    // stage 1 fires on this corpus (planted near-dups share prefixes)
    assert(distinctPfx < Tables.documents(spark, sf001).count())
    // selected tokens respect the survivors' half-token budget
    val tokSel = out.map(_.getLong(5)).sum
    assert(tokSel > 0)
  }

  test("q82 bigram surprisal: descending, non-negative, bounded by the left-count ceiling") {
    val out = rows(Pipeline.q82(spark, sf001))
    assert(out.size == 20)
    val scores = out.map(_.getDouble(3))
    assert(scores == scores.sorted.reverse, "surprisal not descending")
    // each term is digits(c1)−digits(c2) with c2 ≤ c1, so 0 ≤ term ≤
    // digits(max c1)−1; corpus totals at sf0.001 keep digits(c1) ≤ 4
    assert(scores.last >= 0.0 && scores.head <= 3.0)
    out.foreach(r => assert(r.getLong(2) > 0, "doc without bigrams ranked"))
  }

  test("q77 rarity: descending scores within the surprisal ceiling, rarest-doc sanity") {
    val out = rows(Pipeline.q77(spark, sf001))
    assert(out.size == 20)
    val scores = out.map(_.getDouble(3))
    assert(scores == scores.sorted.reverse, "rarity not descending")
    // Ceiling: every per-token surprisal is digits(total) − digits(cf) ≤
    // digits(total) − 1, so the mean is too; totals at sf0.001 are ≪ 10^9.
    assert(scores.head <= 8.0 && scores.last >= 0.0)
    out.foreach(r => assert(r.getLong(2) > 0, "doc with zero tokens ranked"))
  }
}
