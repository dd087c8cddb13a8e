package graft

import graft.queries.Events

/** The two as-of implementations (join+window and union+single-sort) must
  * agree — the latter is the 100 TB path (one exchange, no per-user join
  * fan-out) and is only trusted because of this equivalence.
  */
class AsofSpec extends SparkSpec {

  test("q21 join+window == asofUnionWindow at sf0.001") {
    val a = Events.q21(spark, sf0001)
    val b = Events.asofUnionWindow(spark, sf0001)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q21 join+window == asofUnionWindow at sf0.01") {
    val a = Events.q21(spark, sf001)
    val b = Events.asofUnionWindow(spark, sf001)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("session_window count equals batch lag/cumsum sessionization") {
    val batch = Events.q12(spark, sf0001).head().getLong(0)
    val sw = Events.q12s(spark, sf0001).head().getLong(0)
    assert(batch == sw, s"batch=$batch session_window=$sw")
  }

  test("q12 interval-merge aggregate == lag-window form (sf0.001 and sf0.01)") {
    for (d <- Seq(sf0001, sf001)) {
      val agg = Events.q12(spark, d).head().getLong(0)
      val win = Events.q12LagWindow(spark, d).head().getLong(0)
      assert(agg == win, s"$d: aggregate=$agg lag-window=$win")
    }
  }

  test("SessionCount boundary + merge-order invariance") {
    // same boundary corpus as the session-gap test: exactly 30:00 merges,
    // 30:00.001 splits — and the count must be identical under any
    // insertion/merge order (the aggregate's whole correctness argument)
    val gapUs = 1800L * 1000000L
    val sc = new graft.functions.SessionCount(gapUs)
    def countOf(ts: Seq[Long]): Long =
      sc.finish(ts.foldLeft(sc.zero)((s, t) => sc.reduce(s, t)))
    assert(countOf(Seq(0L, gapUs, 2 * gapUs)) == 1L)         // ties merge
    assert(countOf(Seq(0L, gapUs + 1000)) == 2L)             // +1ms splits
    // bridge: two far intervals joined by a late-arriving middle event
    val spread = Seq(0L, 2 * gapUs, gapUs)
    assert(countOf(spread) == 1L)
    // merge-order invariance across random shuffles and splits
    val rnd = new scala.util.Random(7)
    val ts = Seq.fill(200)(rnd.nextLong(20L * gapUs)).distinct
    val expect = countOf(ts.sorted)
    for (_ <- 1 to 5) {
      val sh = rnd.shuffle(ts)
      val (l, r) = sh.splitAt(sh.length / 3)
      val merged = sc.merge(
        l.foldLeft(sc.zero)(sc.reduce), r.foldLeft(sc.zero)(sc.reduce))
      assert(sc.finish(merged) == expect)
    }
  }

  test("q14 fingerprint distinct == direct string distinct (sf0.001 and sf0.01)") {
    for (d <- Seq(sf0001, sf001)) {
      val fp = graft.queries.TextVec.q14(spark, d).head().getLong(0)
      val direct = graft.queries.TextVec.q14Direct(spark, d).head().getLong(0)
      assert(fp == direct, s"$d: fingerprint=$fp direct=$direct")
    }
  }

  test("session gap boundary: exactly 30 min continues; any more splits") {
    // Pins the gap semantics q12/q12s rely on before anyone builds on them.
    // Both paths split only when the gap is STRICTLY greater than 30 min:
    // the batch form by `gap > 1800.0`, and Spark's session_window because a
    // session's end extends to last_event+gap INCLUSIVELY on merge (an event
    // landing exactly at the current end joins the session — verified here,
    // not assumed from the half-open window rendering). The DuckDB oracle's
    // `> INTERVAL 30 MINUTE` matches. user 1: gaps of exactly 30:00 → one
    // session; user 2: 29:59.999999 → one; user 3: 30:00.001 → two
    // (+1 ms: java.sql.Timestamp literals here carry ms precision).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plusUs(us: Long) = new java.sql.Timestamp(t0.getTime + us / 1000)
    val ev = Seq(
      (1L, t0, 1L), (1L, plusUs(1800L * 1000000), 2L), (1L, plusUs(3600L * 1000000), 3L),
      (2L, t0, 4L), (2L, plusUs(1800L * 1000000 - 1), 5L),
      (3L, t0, 6L), (3L, plusUs(1800L * 1000000 + 1000), 7L))
      .toDF("user_id", "ts", "event_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 2L)
    // batch lag/cumsum path (same expressions as Events.q12)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = ev
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts").cast("double") - col("prev").cast("double") > 1800.0, 1).otherwise(0))
      .groupBy("user_id").agg(sum("ns").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == expected, s"batch: $batch")
    // native session_window operator
    val sw = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sw == expected, s"session_window $sw != expected $expected")
  }
}
