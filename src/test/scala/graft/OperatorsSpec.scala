package graft

import graft.operators.{Graph, Layout, SkewJoin}
import graft.queries.TextVec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Operator-utility specs: connected components vs driver-side union-find,
  * salted join vs plain join.
  */
class OperatorsSpec extends SparkSpec {

  test("dupGroups == union-find on the q15 pair list") {
    val pairs = TextVec.q15(spark, sf001).select("ida", "idb")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // reference: driver-side union-find
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Graph.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("connectedComponents handles a deep chain (pointer-jumping, diameter 99)") {
    import spark.implicits._
    // a 100-node chain (needs O(log n) rounds, not O(n)) + isolated pair;
    // run BOTH the bounded driver fast path (default) and the iterative
    // path (bound forced to 0) — identical labels (r19 fast-path gate)
    val edges = ((1L to 100L).sliding(2).map(s => (s(0), s(1))).toSeq :+ (200L, 201L))
      .toDF("ida", "idb")
    def labels(): Map[Long, Long] = Graph.connectedComponents(edges, "ida", "idb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = labels()
    val iterative =
      try { spark.conf.set("graft.cc.maxDriverEdges", "0"); labels() }
      finally spark.conf.unset("graft.cc.maxDriverEdges")
    assert(fast == iterative, "fast path diverged from the iterative path")
    assert((1L to 100L).forall(fast(_) == 1L))
    assert(fast(200L) == 200L && fast(201L) == 200L)
  }

  test("connectedComponents fast path == iterative path on the q15 pair list") {
    // the shipped q35 input: LSH-verified near-dup pairs (cliques + the
    // occasional bridge). The r19 bounded driver fast path must label them
    // identically to the iterative rounds it replaces at bench scale.
    val pairs = TextVec.q15(spark, sf001).select("ida", "idb")
    def labels(): Map[Long, Long] = Graph.connectedComponents(pairs, "ida", "idb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = labels()
    val iterative =
      try { spark.conf.set("graft.cc.maxDriverEdges", "0"); labels() }
      finally spark.conf.unset("graft.cc.maxDriverEdges")
    assert(fast.nonEmpty && fast == iterative)
  }

  test("connectedComponents throws rather than returning unconverged labels") {
    import spark.implicits._
    val chain = (1L to 60L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("ida", "idb")
    // only the ITERATIVE path has a convergence budget — force it (the
    // bounded fast path needs no rounds and must NOT throw, second block)
    try {
      spark.conf.set("graft.cc.maxDriverEdges", "0")
      intercept[IllegalStateException] {
        Graph.connectedComponents(chain, "ida", "idb", maxIter = 2).collect()
      }
    } finally spark.conf.unset("graft.cc.maxDriverEdges")
    val viaFast = Graph.connectedComponents(chain, "ida", "idb", maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 60L).forall(viaFast(_) == 1L))
  }

  test("connectedComponents reliable mode: requires a checkpoint dir, then matches local mode") {
    import spark.implicits._
    val edges = ((1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq :+ (300L, 301L))
      .toDF("ida", "idb")
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // refuses to invent a driver-local dir (invisible to remote executors)
      intercept[IllegalStateException] {
        Graph.connectedComponents(edges, "ida", "idb", reliable = true)
      }
    }
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString)
    val local = Graph.connectedComponents(edges, "ida", "idb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = Graph.connectedComponents(edges, "ida", "idb", reliable = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel == local)
  }

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = (1 to 2000).map(i => (i.toLong, if (i <= 1800) 7L else (i % 50).toLong))
      .toDF("row_id", "k")
    val dim = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    val plain = skewed.join(dim, "k").select("row_id", "k", "payload")
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", "row_id", 8)
      .select("row_id", "k", "payload")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("z-order layout: partitions cover compact rectangles on BOTH dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two independent uniform dims: a 1-D sort on `a` leaves each file
    // spanning the FULL b-range; z-order must shrink both
    val n = 1 << 14
    val df = (0 until n).map { i =>
      (((i * 2654435761L) & 0xffff).toLong, ((i * 40503L) & 0xffff).toLong)
    }.toDF("a", "b").repartition(8)
    val parts = 16
    def spans(clustered: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val agg = clustered
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("a")) - min(col("a"))).as("sa"), (max(col("b")) - min(col("b"))).as("sb"))
        .agg(avg(col("sa")), avg(col("sb"))).head()
      (agg.getDouble(0), agg.getDouble(1))
    }
    val (za, zb) = spans(Layout.zorder(df, "a", "b", parts))
    val (sa, sb) = spans(df.repartitionByRange(parts, col("a")).sortWithinPartitions("a"))
    // 16 partitions = 4 z-levels per dim -> expect ~1/4 of the 65536 range
    // on BOTH dims (plus boundary slop); 1-D sort: `a` is tight but `b`
    // spans nearly everything
    assert(za < 65536 * 0.45 && zb < 65536 * 0.45,
      f"z-order spans a=$za%.0f b=$zb%.0f — not compact on both dims")
    assert(sb > 65536 * 0.9, f"1-D sort control should span b (got $sb%.0f)")
    assert(za.max(zb) < sb / 2, "z-order not better than 1-D sort on the unsorted dim")
  }

  test("3-column z-order: partitions cover compact ranges on ALL THREE dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // three mutually independent uniform dims: a 1-D sort on `a` leaves
    // each file spanning the full b- and c-ranges; zorderN must shrink all
    val n = 1 << 15
    val df = (0 until n).map { i =>
      (((i * 2654435761L) & 0xffff).toLong,
       ((i * 40503L) & 0xffff).toLong,
       ((i * 928371L) & 0xffff).toLong)
    }.toDF("a", "b", "c").repartition(8)
    val parts = 64
    def spans(clustered: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val agg = clustered
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("a")) - min(col("a"))).as("sa"),
          (max(col("b")) - min(col("b"))).as("sb"),
          (max(col("c")) - min(col("c"))).as("sc"))
        .agg(avg(col("sa")), avg(col("sb")), avg(col("sc"))).head()
      (agg.getDouble(0), agg.getDouble(1), agg.getDouble(2))
    }
    val (za, zb, zc) = spans(Layout.zorderN(df, Seq("a", "b", "c"), parts))
    val (_, sb, sc) = spans(df.repartitionByRange(parts, col("a")).sortWithinPartitions("a"))
    // 64 partitions = 6 z-prefix bits = 2 bits per dim -> ~1/4 of the
    // 65536 range per dim ideally; range-partition boundaries sampled by
    // repartitionByRange straddle bit boundaries, so allow ~2x slop —
    // still far below the control's full-range span
    for ((s, nm) <- Seq((za, "a"), (zb, "b"), (zc, "c")))
      assert(s < 65536 * 0.55, f"z-order span $nm=$s%.0f — not compact on all dims")
    assert(sb > 65536 * 0.9 && sc > 65536 * 0.9,
      f"1-D sort control should span b and c (got $sb%.0f, $sc%.0f)")
    // 0.6·sb, not sb/2: RangePartitioner samples with an rdd.id-derived
    // seed, so boundaries (and these spans) shift a few percent with how
    // many RDDs earlier suites created in the shared session — a /2
    // threshold sat within that jitter (33179 vs 32690 in one full-suite
    // order) while the claim being tested (every z dim far below the
    // 1-D control's full-range span) holds with huge margin either way
    assert(za.max(zb).max(zc) < sb * 0.6, "3-col z-order not better than 1-D sort")
  }

  test("zorderN edge cases: constant column (degenerate range) and 4-dim bit budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a constant dimension must bucket to 0 (no divide-by-zero) and not
    // disturb clustering on the live dims
    val df = (0 until 4096).map(i =>
      (((i * 2654435761L) & 0xffff).toLong, 7L, ((i * 40503L) & 0xffff).toLong))
      .toDF("a", "k", "b")
    val out = Layout.zorderN(df, Seq("a", "k", "b"), 8)
    assert(out.count() === 4096)
    assert(out.columns.toSeq === Seq("a", "k", "b"), "helper columns must not leak")
    // 4 dims: 15 bits each, z fits a positive long
    val df4 = (0 until 1024).map(i =>
      ((i % 37).toLong, (i % 11).toLong, (i % 5).toLong, (i % 3).toLong))
      .toDF("w", "x", "y", "z")
    val z4 = df4.select(Layout.zValueN(
      Seq(col("w"), col("x"), col("y"), col("z")), Layout.bitsPerDim(4)).as("zv"))
      .collect().map(_.getLong(0))
    assert(z4.forall(_ >= 0L), "z value must stay a positive long")
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("w")), 16) // < 2 dims refused
    }
  }

  test("Misra-Gries: heavy-hitter superset guarantee under eviction and merge") {
    import spark.implicits._
    // 10k arrivals, 200 distinct: 3 planted hot items + a long uniform
    // tail; k=20 forces constant eviction, repartition forces merges
    val hot = Seq.fill(1500)("hot1") ++ Seq.fill(1200)("hot2") ++ Seq.fill(900)("hot3")
    val tail = (0 until 6400).map(i => s"t${i % 197}")
    val data = scala.util.Random.shuffle(hot ++ tail)
    val k = 20
    val ds = data.toDS().repartition(9)
    val sketch = ds.select(graft.functions.MisraGries(k)).head()
    assert(sketch.size <= k, s"state exceeded k: ${sketch.size}")
    val nTotal = data.size
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every item with true count > n/(k+1) must be present...
    val mustHave = exact.filter(_._2 > nTotal.toLong / (k + 1)).keySet
    assert(mustHave.subsetOf(sketch.keySet),
      s"missing heavy hitters: ${mustHave -- sketch.keySet}")
    // ...and kept counters underestimate by at most n/(k+1)
    sketch.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth && truth - est <= nTotal.toLong / (k + 1),
        s"$item: est=$est truth=$truth outside MG bound")
    }
  }

  test("q47 two-pass heavy hitters equals exact groupBy-and-threshold") {
    import org.apache.spark.sql.functions._
    val dir = sf0001
    val sketchBased = graft.queries.Pipeline.q47(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val terms = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val total = terms.count()
    val exact = terms.groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") * 30 > total)
      .orderBy(col("c").desc, col("term")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(sketchBased.nonEmpty && sketchBased.sameElements(exact))
  }

  test("q56 fuzzy blocking: dedupe+band histogram == brute force; hot prefix sub-blocks") {
    import spark.implicits._
    // planted HOT PREFIX: every name starts with "hotp", lengths 8..34 —
    // the adversarial case for prefix-only blocking (one quadratic block).
    // Consecutive lengths differ by 1, so cross-band d<=4 pairs exist and
    // exercise the band±1 fan-out. Multiplicities exercise the count
    // products (incl. same-name d=0 pairs).
    val hot = (4 to 60).map(k => "hotp" + "a" * k)
    val cold = Seq("cold fish", "cold dish", "warm fish", "warm fish")
    val rows = (hot ++ cold).zipWithIndex.flatMap { case (n, i) => Seq.fill(1 + i % 3)(n) }
    val got = graft.queries.Relational.fuzzyNameHistogram(rows.toDF("p_name"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // brute-force reference: all row pairs, same 4-char prefix, lev <= 4
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val arr = rows.toArray
    val brute = (for {
      i <- arr.indices.iterator; j <- (i + 1 until arr.length).iterator
      if arr(i).take(4) == arr(j).take(4)
      d = lev(arr(i), arr(j)) if d <= 4
    } yield d).toSeq.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(got == brute, s"got $got expected $brute")

    // sub-blocking bound: the hot prefix's distinct names must spread over
    // multiple (prefix, band) blocks, so the pair scan is sum of small
    // squares, not one big square. Mirrors the engine's block key exactly.
    val bySize = hot.groupBy(n => n.length / 8).view.mapValues(_.size.toLong).toMap
    assert(bySize.size >= 4, s"expected >=4 length bands, got $bySize")
    assert(bySize.values.max <= hot.size / 2,
      s"hot prefix not subdivided: max block ${bySize.values.max} of ${hot.size}")
    // candidate pairs the banded join generates (each name probes its own
    // band ±1) vs the quadratic scan prefix-only blocking would pay
    val banded = bySize.map { case (b, s) =>
      s * (bySize.getOrElse(b - 1, 0L) + s + bySize.getOrElse(b + 1, 0L))
    }.sum
    val quadratic = hot.size.toLong * hot.size
    assert(banded * 2 < quadratic,
      s"banded pair scan $banded not < half of quadratic $quadratic")
  }

  test("q57 arg-extremes tiebreak survives event_ids past the old 10^10 bound") {
    import spark.implicits._
    // the retired integer composite key (round(v*100)*1e10 + id) collided
    // exactly here: ids >= 1e10 bled into the value digits. The struct key
    // must keep ordering by value FIRST, then by id, at any id magnitude.
    val big = 10000000000L // 1e10 — first id the old encoding corrupted
    val df = Seq(
      ("a", big + 7L, 5.00), ("a", big + 3L, 5.00), // tie on value, huge ids
      ("a", 12L, 99.99),                            // larger value, small id
      ("b", big + 1L, 1.00), ("b", 2L, 1.00),       // tie across the bound
      ("b", 3L, 0.50),
      // the smoking gun: a huge id on the SMALLER value. Old key for
      // (6e10, 1.00) = 100e10 + 6e10 = 1.06e12 beat (5, 1.01)'s 1.01e12,
      // returning the wrong arg-max; the struct key orders value first.
      ("c", 6L * big, 1.00), ("c", 5L, 1.01)
    ).toDF("event_type", "event_id", "value")
    val got = graft.queries.Events.argExtremes(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // emax: row attaining max value (tiebreak: larger id); emin: min value
    // (tiebreak: larger id); vmax: the max value itself
    assert(got.toSeq == Seq(
      ("a", 12L, big + 7L, 99.99), // min value 5.00 tie -> larger id wins
      ("b", big + 1L, 3L, 1.00),   // max value 1.00 tie -> larger id wins
      ("c", 5L, 6L * big, 1.01)))  // value outranks any id magnitude
  }

  test("q70 retention: offset-0 equals cohort size, later offsets never exceed it") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Events.q70(spark, sf001).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val base = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    // every cohort must have an offset-0 row (its members were, by
    // definition, active in their first week) bounding all later weeks
    rows.foreach { case (cohort, _, n) =>
      assert(base.contains(cohort))
      assert(n <= base(cohort), s"cohort $cohort retains more users than it has")
    }
    // cohort sizes partition the user base: totals must match
    val users = graft.Tables.events(spark, sf001)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(base.values.sum == users)
  }

  test("q72 length deciles: equal population, contiguous length ranges") {
    val rows = graft.queries.Pipeline.q72(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      // ntile: bucket populations within a source differ by at most 1,
      // and every one of the 10 deciles is populated (>= 10 docs/source)
      assert(g.map(_._2).sorted.toSeq == (1L to 10L), s"$src deciles")
      val ns = g.map(_._3)
      assert(ns.max - ns.min <= 1, s"$src populations $ns")
      // ordering by n_chars: decile d's max never exceeds decile d+1's min
      val byD = g.sortBy(_._2)
      byD.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$src ranges overlap: $a $b")
        case _ =>
      }
    }
  }

  test("q73 source cap: kept = min(total, cap); keep side WindowGroupLimits") {
    val rows = graft.queries.Pipeline.q73(spark, sf001, cap = 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, total, kept) =>
      assert(kept == math.min(total, 15L), s"$src total=$total kept=$kept")
    }
    // the keep-side operator agrees with the census and pushes the rank
    // filter below the exchange (per-partition top-cap heaps)
    val docs = graft.Tables.documents(spark, sf001)
    val capped = graft.queries.Pipeline.sourceCapped(docs, 15)
    val keptBy = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, _, kept) => assert(keptBy.getOrElse(src, 0L) == kept) }
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("q74 kmeans assignment: mass conserved, all centroids live, self-distance zero") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Pipeline.q74(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // each centroid is its own nearest (d = 0), so all 8 clusters are live
    assert(rows.map(_._1).sorted.toSeq == (0L to 7L))
    val total = graft.Tables.embeddings(spark, sf001).count()
    assert(rows.map(_._2).sum == total, "every embedding assigned exactly once")
    rows.foreach { case (c, n, avg) => assert(avg >= 0.0 && n > 0, s"cluster $c") }
  }

  test("q76 approx percentiles sit inside the exact ±0.01-quantile envelope") {
    import org.apache.spark.sql.functions._
    // exact envelope via the same pre-reduced (value, frequency) machinery
    // as q53: with accuracy 10 000, G-K guarantees rank error <= n/10 000,
    // far inside the ±0.01-quantile band
    val env = graft.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("v"), lit(0.49), col("f")).as("lo50"),
        percentile(col("v"), lit(0.51), col("f")).as("hi50"),
        percentile(col("v"), lit(0.89), col("f")).as("lo90"),
        percentile(col("v"), lit(0.91), col("f")).as("hi90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = graft.queries.Relational.q76(spark, sf001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (lo50, hi50, lo90, hi90) = env(r.getString(0))
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      assert(a50 >= lo50 && a50 <= hi50, s"${r.getString(0)} p50 $a50 not in [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"${r.getString(0)} p90 $a90 not in [$lo90,$hi90]")
    }
  }

  test("q75 quantization error: step bound holds; zero-vector and on-grid branches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus: per-vector |err| can never exceed half a quantization step,
    // and a step is ma/127 — so max_err < (global max |x|) / 254 is a hard
    // bound per label (using the label's largest amplitude as the bound)
    val census = graft.queries.Pipeline.q75(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(census.nonEmpty)
    census.foreach { case (l, n, mse, me) =>
      assert(n > 0 && mse >= 0.0 && me >= 0.0, s"label $l")
      assert(mse <= me * me + 1e-9, s"label $l: mean square exceeds worst square")
    }
    // constructed branches: an all-zero vector (ma = 0) and a vector whose
    // elements sit exactly on the int8 grid must both quantize with zero
    // error. Grid exactness needs scale = 1.0 exactly, so use integer
    // elements with max = 127: every step of the double pipeline is exact.
    val planted = Seq(
      (0, Array.fill(8)(0.0f)),
      (1, Array(0.0f, 1.0f, 2.0f, 5.0f, 10.0f, 50.0f, 100.0f, 127.0f))).toDF("label", "embedding")
    val out = graft.queries.Pipeline.quantErrorCensus(planted).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out == Seq((0, 0.0, 0.0), (1, 0.0, 0.0)), s"planted: ${out.toList}")
  }

  test("q71 transitions: matrix mass = events - users; shares sum to 1 per row") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Events.q71(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // each user's first event has no predecessor, every other event has
    // exactly one: total transition count = |events| - |users|
    val (nEv, nUs) = {
      val h = graft.Tables.events(spark, sf001)
        .agg(count(lit(1)), countDistinct(col("user_id"))).head()
      (h.getLong(0), h.getLong(1))
    }
    assert(rows.map(_._3).sum == nEv - nUs)
    rows.groupBy(_._1).foreach { case (prv, g) =>
      val s = g.map(_._4).sum
      assert(math.abs(s - 1.0) < 0.01, s"shares for $prv sum to $s")
    }
  }

  test("KernelFinale.aggregate == treeAggregate on both tiers, incl. empty/skewed RDDs") {
    import graft.operators.KernelFinale
    val sc = spark.sparkContext
    def viaTree(rdd: org.apache.spark.rdd.RDD[Int]): (Long, Long) =
      rdd.treeAggregate((0L, 0L))(
        { case ((s, n), v) => (s + v, n + 1) },
        { case ((s1, n1), (s2, n2)) => (s1 + s2, n1 + n2) }, depth = 2)
    def viaFinale(rdd: org.apache.spark.rdd.RDD[Int]): (Long, Long) =
      KernelFinale.aggregate(rdd, () => (0L, 0L))(
        { case ((s, n), v) => (s + v, n + 1) },
        { case ((s1, n1), (s2, n2)) => (s1 + s2, n1 + n2) })
    // single-stage tier: empty, single-partition, skewed (empty partitions)
    for (rdd <- Seq(
        sc.parallelize(Seq.empty[Int], 4),
        sc.parallelize(1 to 1000, 1),
        sc.parallelize(1 to 1000, 16).filter(_ % 7 == 0))) {
      assert(viaFinale(rdd) === viaTree(rdd))
    }
    // past the cutover the call IS treeAggregate — pin the routing by
    // running a partition count just above it
    val wide = sc.parallelize(1 to 2000, KernelFinale.singleStageMaxPartitions + 1)
    assert(viaFinale(wide) === viaTree(wide))
    // primitiveRows: null + boxed long round-trip through collect
    val df = KernelFinale.primitiveRows(spark,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType, nullable = true))),
      Seq(Array[Any](java.lang.Long.valueOf(7L)), Array[Any](null)))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
      === Seq(7L, -1L))
  }
}
