package graft

import graft.operators.{ColumnarScan, LongAccMap}
import graft.queries.Events
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The columnar-batch kernel seam (operators/ColumnarScan) and its first
  * operator, q11's columnar twin (driver-gated as q100 on q11's oracle).
  *
  * The parity tests collect BOTH forms fully — the kernel must reproduce
  * the declarative result row-for-row including column order, types, and
  * the exact rounded doubles (same fixed-point arithmetic), because the
  * driver hashes them against the same DuckDB SQL.
  */
class ColumnarKernelSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("q11 columnar kernel == declarative q11, rows/schema/values (2 SFs)") {
    for (dir <- Seq(sf0001, sf001)) {
      val want = Events.q11(spark, dir)
      val got = Events.q11ColumnarKernel(spark, dir)
      assert(got.schema.map(f => (f.name, f.dataType)) ===
        want.schema.map(f => (f.name, f.dataType)), s"schema at $dir")
      assert(rowsOf(got) === rowsOf(want), s"rows at $dir")
    }
  }

  test("kernel handles null ts / event_type / value exactly as the declarative form") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("colkernel").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.25, "{}"),
      Row(2L, ts("2024-01-01 11:00:00"), 1L, "click", null, "{}"),   // null value counted, not summed
      Row(3L, ts("2024-01-01 12:00:00"), 2L, null, 2.50, "{}"),      // null type group
      Row(4L, null, 2L, "view", 3.75, "{}"),                          // null ts -> null day group
      Row(5L, ts("2024-01-02 00:00:00"), 3L, "view", null, "{}"),    // all-null-value group -> s NULL
      Row(6L, ts("2023-12-31 23:59:59"), 3L, "click", -1.25, "{}"))  // negative value, prior day
    spark.createDataFrame(rows.asJava, schema)
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val want = rowsOf(Events.q11(spark, tmp))
    val got = rowsOf(Events.q11ColumnarKernel(spark, tmp))
    assert(got === want)
    // sanity on the crafted corpus itself: the all-null-value group is NULL
    assert(want.exists(r => r.get(3) == null))
  }

  test("q1 columnar kernel == declarative q1, rows/schema/values (2 SFs)") {
    for (dir <- Seq(sf0001, sf001)) {
      val want = graft.queries.Relational.q1(spark, dir)
      val got = graft.queries.Relational.q1ColumnarKernel(spark, dir)
      assert(got.schema.map(f => (f.name, f.dataType)) ===
        want.schema.map(f => (f.name, f.dataType)), s"schema at $dir")
      assert(rowsOf(got) === rowsOf(want), s"rows at $dir")
    }
  }

  test("q12/q13 columnar sorted kernels == declarative twins over the staged layout (2 SFs)") {
    for (dir <- Seq(sf0001, sf001)) {
      val staged = Layouts.eventsByUserCached(spark, dir, buckets = 8)
      assert(rowsOf(Events.q13FromColumnarSortedKernel(staged)) ===
        rowsOf(Events.q13(spark, dir)), s"q13 at $dir")
      assert(rowsOf(Events.q12FromColumnarSortedKernel(staged)) ===
        rowsOf(Events.q12(spark, dir)), s"q12 at $dir")
    }
  }

  test("q6/q3/q2/q5 columnar kernels == declarative twins (2 SFs)") {
    import graft.queries.Relational
    for (dir <- Seq(sf0001, sf001)) {
      for ((name, want, got) <- Seq(
        ("q6", Relational.q6(spark, dir), Relational.q6ColumnarKernel(spark, dir)),
        ("q3", Relational.q3(spark, dir), Relational.q3ColumnarKernel(spark, dir)),
        ("q2", Relational.q2(spark, dir), Relational.q2ColumnarKernel(spark, dir)),
        ("q5", Relational.q5(spark, dir), Relational.q5ColumnarKernel(spark, dir)))) {
        assert(got.schema.map(f => (f.name, f.dataType)) ===
          want.schema.map(f => (f.name, f.dataType)), s"$name schema at $dir")
        assert(rowsOf(got) === rowsOf(want), s"$name rows at $dir")
      }
    }
  }

  test("q7/q4/q10 columnar kernels == declarative twins (2 SFs)") {
    import graft.queries.{Events, Relational}
    for (dir <- Seq(sf0001, sf001)) {
      for ((name, want, got) <- Seq(
        ("q7", Relational.q7(spark, dir), Relational.q7ColumnarKernel(spark, dir)),
        ("q4", Relational.q4(spark, dir), Relational.q4ColumnarKernel(spark, dir)),
        ("q10", Events.q10(spark, dir), Events.q10ColumnarKernel(spark, dir)),
        ("q16", graft.queries.TextVec.q16(spark, dir), graft.queries.TextVec.q16ColumnarKernel(spark, dir)),
        ("q17", graft.queries.TextVec.q17(spark, dir), graft.queries.TextVec.q17ColumnarKernel(spark, dir)),
        ("q14", graft.queries.TextVec.q14(spark, dir), graft.queries.TextVec.q14ColumnarKernel(spark, dir)))) {
        assert(got.schema.map(f => (f.name, f.dataType)) ===
          want.schema.map(f => (f.name, f.dataType)), s"$name schema at $dir")
        assert(rowsOf(got) === rowsOf(want), s"$name rows at $dir")
      }
    }
  }

  test("q1 kernel: per-sum NULL semantics on a crafted lineitem with nulls everywhere") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q1col").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = ts("1995-01-01 00:00:00"); val out = ts("1999-01-01 00:00:00")
    val rows = Seq(
      Row(1L, 1L, 1L, 1, 10.0, 100.0, 0.1, 0.0, "A", "F", in),
      Row(2L, 1L, 1L, 1, null, 200.0, 0.2, 0.0, "A", "F", in),   // null qty: counted, qty-sum skips
      Row(3L, 1L, 1L, 1, 5.0, null, 0.1, 0.0, "A", "F", in),     // null price: base+disc skip
      Row(4L, 1L, 1L, 1, 5.0, 300.0, null, 0.0, "A", "F", in),   // null discount: disc-sum skips
      Row(5L, 1L, 1L, 1, 1.0, 50.0, 0.0, 0.0, null, "F", in),    // null flag group
      Row(6L, 1L, 1L, 1, 2.0, 60.0, 0.0, 0.0, "R", null, in),    // null status group
      Row(7L, 1L, 1L, 1, null, null, null, 0.0, "N", "O", in),   // all-null sums group
      Row(8L, 1L, 1L, 1, 9.0, 900.0, 0.1, 0.0, "A", "F", out),   // filtered out
      Row(9L, 1L, 1L, 1, 9.0, 900.0, 0.1, 0.0, "A", "F", null))  // null shipdate: dropped
    spark.createDataFrame(rows.asJava, schema)
      .repartition(3).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val want = rowsOf(graft.queries.Relational.q1(spark, tmp))
    val got = rowsOf(graft.queries.Relational.q1ColumnarKernel(spark, tmp))
    assert(got === want)
    // the crafted corpus really exercised the all-NULL path
    assert(want.exists(r => r.getString(0) == "N" && r.get(2) == null))
  }

  test("q10 kernel: null props / null event_type / all-null-probe groups") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q10col").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2024-01-01 00:00:00")
    val rows = Seq(
      Row(1L, t0, 1L, "click", 1.0, """{"k": 7}"""),
      Row(2L, t0, 1L, "click", 1.0, null),                    // null props
      Row(3L, t0, 1L, null, 1.0, """{"k": 5}"""),             // null type group
      Row(4L, t0, 1L, "view", 1.0, """{"x": 1}"""),           // key missing -> all-null group
      Row(5L, t0, 1L, "view", 1.0, """{"k": "oops"}"""),      // non-numeric -> null
      Row(6L, t0, 1L, "buy", 1.0, """{"k": -2147483649}"""))  // out of int range -> null group
    spark.createDataFrame(rows.asJava, schema)
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val want = rowsOf(graft.queries.Events.q10(spark, tmp))
    val got = rowsOf(graft.queries.Events.q10ColumnarKernel(spark, tmp))
    assert(got === want)
    assert(want.exists(r => r.getString(0) == "view" && r.get(1) == null))
    assert(want.exists(r => r.get(0) == null))
  }

  test("q5/q6 kernels: null custkey group and null ordering tiers on a crafted corpus") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("nullorders").toString
    val oschema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))
    val orows = Seq(
      Row(1L, null, 500.0),  // null custkey -> its own FIRST group (ASC NULLS FIRST)
      Row(2L, null, 600.0),
      Row(3L, 1L, 100.0), Row(4L, 1L, null), // null price skipped by TopKPriceRows
      Row(5L, 2L, 100.0), Row(null, 2L, 999.0)) // null orderkey skipped
    spark.createDataFrame(orows.asJava, oschema)
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val plain = spark.read.parquet(s"$tmp/orders.parquet")
    assert(rowsOf(graft.queries.Relational.q5ColumnarKernelFrom(plain)) ===
      rowsOf(graft.queries.Relational.q5From(plain)))

    val lschema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_extendedprice", DoubleType)))
    // fewer than 10 rows, with nulls in every ordering column: the
    // candidate comparator's null tiers (price DESC NULLS LAST,
    // okey/lineno ASC NULLS FIRST) all surface in the answer
    val lrows = Seq(
      Row(1L, 1, 100.0), Row(1L, 2, null), Row(null, 1, 50.0),
      Row(2L, null, 100.0), Row(null, null, null), Row(3L, 3, 100.0))
    val tmp2 = java.nio.file.Files.createTempDirectory("nullli").toString
    spark.createDataFrame(lrows.asJava, lschema)
      .repartition(2).write.mode("overwrite").parquet(s"$tmp2/lineitem.parquet")
    val li = spark.read.parquet(s"$tmp2/lineitem.parquet")
    val want = li.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10).collect().toSeq
    val got = rowsOf(graft.queries.Relational.q6ColumnarKernel(spark, tmp2))
    assert(got === want)
  }

  test("q102/q103 columnar scans stay bucket-aligned (one partition per bucket)") {
    val staged = Layouts.eventsByUserCached(spark, sf0001, buckets = 8)
    val (rdd, _) = ColumnarScan.batches(
      staged.select(col("user_id"), col("ts"), col("event_type")))
    assert(rdd.getNumPartitions === 8,
      "size-based splits crept back into the bucketed kernel scan")
  }

  test("q5 columnar kernel survives adversarial partitioning (per-partition top-k merge)") {
    // the smallest-100-custkeys-per-partition bound must stay lossless
    // when one customer's orders scatter across every partition: write a
    // crafted corpus where custkey 1 has its best order in the LAST file
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("q5col").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
    val rows = (1L to 500L).flatMap { ck =>
      Seq(Row(ck * 10 + 1, ck, 100.0 + ck), Row(ck * 10 + 2, ck, 200.0 + ck),
        Row(ck * 10 + 3, ck, 300.0 + ck), Row(ck * 10 + 4, ck, 50.0 + ck))
    } :+ Row(9999L, 1L, 99999.0) // custkey 1's true best, far from its others
    val df = spark.createDataFrame(rows.asJava, schema).repartition(8)
    df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val plain = spark.read.parquet(s"$tmp/orders.parquet")
    val want = rowsOf(graft.queries.Relational.q5From(plain))
    val got = rowsOf(graft.queries.Relational.q5ColumnarKernelFrom(plain))
    assert(got === want)
    // and the crafted best really is in the answer
    assert(got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 9999L && r.getLong(3) == 1L))
  }

  test("sorted columnar kernels reject a mis-laid-out input loudly") {
    // a plain (unbucketed, unsorted) events scan violates the ascending
    // (user_id, ts) precondition — the in-scan guard must fire, because a
    // single-pass answer on unsorted input would be silently wrong
    val plain = graft.Tables.events(spark, sf001)
    val e = intercept[Exception] {
      Events.q13FromColumnarSortedKernel(plain).collect()
    }
    assert(e.getMessage.contains("layout") || e.getMessage.contains("Layout")
      || e.getMessage.contains("sorted"), s"got: ${e.getMessage}")
  }

  test("ColumnarScan rejects plan shapes a kernel would silently discard (sort/exchange)") {
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .repartition(4, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
    val e = intercept[IllegalStateException] { ColumnarScan.soleColumnarScan(df) }
    assert(e.getMessage.contains("silently discarded"))
  }

  test("non-columnar scan fails loudly, never silently row-aggregates") {
    val key = "spark.sql.parquet.enableVectorizedReader"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = spark.read.parquet(s"$sf0001/events.parquet")
        .select(col("user_id"))
      val e = intercept[IllegalStateException] { ColumnarScan.batches(df) }
      assert(e.getMessage.contains("ColumnarBatch"))
    } finally spark.conf.set(key, old)
  }

  test("ColumnarScan rejects multi-leaf plans") {
    val a = spark.range(10).toDF("x")
    val b = spark.range(10).toDF("y")
    val e = intercept[IllegalStateException] {
      ColumnarScan.soleColumnarScan(a.crossJoin(b))
    }
    assert(e.getMessage.contains("exactly one scan leaf"))
  }

  test("q7 kernel: data-null flag values vs rollup subtotal markers stay distinct cells") {
    // the r12 ADVICE failure mode: a detail cell ('A', null-data) and the
    // per-flag subtotal ('A', <marker>) render identically but are separate
    // ROLLUP output rows — conflating them double-counts the detail into
    // one merged row and loses a row vs Spark/DuckDB
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q7col").toString
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_extendedprice", DoubleType)))
    val rows = Seq(
      Row("A", "F", 100.0), Row("A", "F", 200.0),
      Row("A", null, 10.0),              // data-null status inside flag A
      Row("A", null, 20.0),
      Row(null, "F", 5.0),               // data-null flag
      Row(null, null, 1.0),              // both data-null
      Row("R", "O", 50.0))
    spark.createDataFrame(rows.asJava, schema)
      .repartition(3).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val want = rowsOf(graft.queries.Relational.q7(spark, tmp))
    val got = rowsOf(graft.queries.Relational.q7ColumnarKernel(spark, tmp))
    // compare as multisets: rows tying on BOTH sort keys (a data-null
    // detail cell and its enclosing subtotal) have engine-unspecified
    // relative order — the driver's hash canonicalizes the same way
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
      want.groupBy(identity).view.mapValues(_.size).toMap)
    // the corpus really produced two distinct ('A', NULL) rows:
    // the detail cell (2 rows) and the subtotal over all 4 'A' rows
    val aNull = want.filter(r => r.get(0) == "A" && r.get(1) == null)
    assert(aNull.map(_.getLong(2)).sorted === Seq(2L, 4L))
  }

  test("q2 kernel: duplicate nation names merge into one group; null name never NPEs") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q2col").toString
    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .repartition(2).write.mode("overwrite").parquet(s"$tmp/$name.parquet")
    write("region", StructType(Seq(
      StructField("r_regionkey", LongType), StructField("r_name", StringType))),
      Seq(Row(1L, "ASIA"), Row(2L, "EUROPE")))
    write("nation", StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_regionkey", LongType),
      StructField("n_name", StringType))),
      // two nationkeys SHARING a name, plus a null-name nation, all in ASIA
      Seq(Row(1L, 1L, "ALIKE"), Row(2L, 1L, "ALIKE"), Row(3L, 1L, null)))
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_nationkey", LongType))),
      Seq(Row(10L, 1L), Row(20L, 2L), Row(30L, 3L)))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType))),
      Seq(Row(100L, 10L), Row(200L, 20L), Row(300L, 30L)))
    // revenues: ALIKE = 100 + 50 (merged across its two nationkeys);
    // null-name = 150 — a TIE, so the final comparator must compare a null
    // name (the exact line that NPE'd pre-fix)
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType))),
      Seq(Row(100L, 100.0, 0.0), Row(200L, 50.0, 0.0), Row(300L, 150.0, 0.0)))
    val want = rowsOf(graft.queries.Relational.q2(spark, tmp))
    val got = rowsOf(graft.queries.Relational.q2ColumnarKernel(spark, tmp))
    assert(got === want)
    assert(want.size === 2, s"duplicate names must merge: $want")
    assert(want.exists(_.get(0) == null), "null-name group must survive")
  }

  test("q2 kernel rejects duplicate n_nationkey loudly (nation-level PK guard)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q2dupnat").toString
    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .write.mode("overwrite").parquet(s"$tmp/$name.parquet")
    write("region", StructType(Seq(
      StructField("r_regionkey", LongType), StructField("r_name", StringType))),
      Seq(Row(1L, "ASIA")))
    write("nation", StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_regionkey", LongType),
      StructField("n_name", StringType))),
      Seq(Row(1L, 1L, "X"), Row(1L, 1L, "Y")))   // duplicate PK
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_nationkey", LongType))),
      Seq(Row(10L, 1L)))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType))),
      Seq(Row(100L, 10L)))
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType))),
      Seq(Row(100L, 100.0, 0.0)))
    val e = intercept[IllegalStateException] {
      graft.queries.Relational.q2ColumnarKernel(spark, tmp).collect()
    }
    assert(e.getMessage.contains("duplicate n_nationkey"))
  }

  test("q3 kernel rejects duplicate o_orderkey loudly (one-band-per-key map)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("q3dup").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    spark.createDataFrame(Seq(
      Row(1L, ts("1995-01-01 00:00:00")),
      Row(1L, ts("1995-06-01 00:00:00")),  // duplicate PK
      Row(2L, ts("1995-01-01 00:00:00"))).asJava,
      StructType(Seq(StructField("o_orderkey", LongType),
        StructField("o_orderdate", TimestampType))))
      .repartition(2).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    spark.createDataFrame(Seq(
      Row(1L, ts("1995-01-02 00:00:00"), 10.0)).asJava,
      StructType(Seq(StructField("l_orderkey", LongType),
        StructField("l_shipdate", TimestampType),
        StructField("l_extendedprice", DoubleType))))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val e = intercept[IllegalStateException] {
      graft.queries.Relational.q3ColumnarKernel(spark, tmp).collect()
    }
    assert(e.getMessage.contains("duplicate o_orderkey"))
  }

  test("StringIdInterner throws at the packed-key id cap instead of aliasing the NULL sentinel") {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types.StringType
    val v = new OnHeapColumnVector(3, StringType)
    Seq("a", "b", "c").zipWithIndex.foreach { case (s, i) =>
      val bytes = s.getBytes("UTF-8"); v.putByteArray(i, bytes, 0, bytes.length)
    }
    val in = new graft.operators.StringIdInterner(maxIds = 2)
    in.bind(v)
    assert(in.idAt(0) === 0)
    assert(in.idAt(1) === 1)
    val e = intercept[IllegalStateException] { in.idAt(2) }
    assert(e.getMessage.contains("id cap"))
  }

  test("LongAccMap fails loudly at its growth ceiling instead of allocating unbounded state") {
    val m = new LongAccMap(1, initCap = 8, maxCap = 16)
    val e = intercept[IllegalStateException] {
      (1L to 32L).foreach(m.slot(_))
    }
    assert(e.getMessage.contains("no longer bounded"))
  }

  test("q114 (q9a distinct-users kernel) == declarative q9a (2 SFs)") {
    for (dir <- Seq(sf0001, sf001)) {
      val want = rowsOf(Events.q9a(spark, dir))
      val got = rowsOf(Events.q9aColumnarKernel(spark, dir))
      assert(got === want, s"at $dir")
    }
  }

  test("q112/q113/q114 distributed finales (forced past the broadcast gate) == declarative twins") {
    // shrink the broadcast threshold so withinBroadcastBound fails and the
    // kernels take their distributed (reduceByKey / distinct().count())
    // finale — the at-scale path must produce the identical answer
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key, "10485760")
    spark.conf.set(key, "1")
    try {
      assert(rowsOf(graft.queries.TextVec.q17ColumnarKernel(spark, sf001)) ===
        rowsOf(graft.queries.TextVec.q17(spark, sf001)), "q112 distributed finale")
      assert(rowsOf(graft.queries.TextVec.q14ColumnarKernel(spark, sf001)) ===
        rowsOf(graft.queries.TextVec.q14(spark, sf001)), "q113 distributed finale")
      assert(rowsOf(Events.q9aColumnarKernel(spark, sf001)) ===
        rowsOf(Events.q9a(spark, sf001)), "q114 distributed finale")
    } finally spark.conf.set(key, saved)
  }

  test("join-kernel builds refuse loudly past the broadcast regime") {
    // fresh crafted dir (the per-(session,dir) build caches would otherwise
    // satisfy the call before the gate runs)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("overregime").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    spark.createDataFrame(Seq(
      Row(1L, 10L, ts("1995-01-01 00:00:00"))).asJava,
      StructType(Seq(StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderdate", TimestampType))))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    spark.createDataFrame(Seq(
      Row(1L, ts("1995-01-02 00:00:00"), 10.0)).asJava,
      StructType(Seq(StructField("l_orderkey", LongType),
        StructField("l_shipdate", TimestampType),
        StructField("l_extendedprice", DoubleType))))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    spark.createDataFrame(Seq(Row(10L)).asJava,
      StructType(Seq(StructField("c_custkey", LongType))))
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key, "10485760")
    spark.conf.set(key, "1")
    try {
      val e3 = intercept[IllegalStateException] {
        graft.queries.Relational.q3ColumnarKernel(spark, tmp).collect()
      }
      assert(e3.getMessage.contains("broadcast regime"))
      val e4 = intercept[IllegalStateException] {
        graft.queries.Relational.q4ColumnarKernel(spark, tmp).collect()
      }
      assert(e4.getMessage.contains("broadcast regime"))
    } finally spark.conf.set(key, saved)
  }

  test("interner survives parquet dictionary fallback (tiny dict page) == declarative") {
    // force the writer to abandon dictionary encoding: a 64-byte dictionary
    // page cap overflows after a handful of distinct strings, so the
    // column arrives PLAIN-encoded and StringIdInterner's content-hash
    // path (not the dictionary-id fast path) carries the whole batch —
    // the explicit fallback coverage the r12 verdict asked for
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("dictfall").toString
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_extendedprice", DoubleType)))
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      Row(s"flag-${rnd.nextInt(300)}", s"st-${rnd.nextInt(200)}", (i % 97).toDouble)
    }
    spark.createDataFrame(rows.asJava, schema)
      .repartition(2).write
      .option("parquet.dictionary.page.size", "64")
      .mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // confirm the corpus really defeated dictionary encoding: at least one
    // batch must report no dictionary for the flag column
    val (bs, sch) = ColumnarScan.batches(
      spark.read.parquet(s"$tmp/lineitem.parquet").select(col("l_returnflag")))
    val rfIdx = sch.fieldIndex("l_returnflag")
    val sawPlain = bs.map { b =>
      b.column(rfIdx) match {
        case w: org.apache.spark.sql.execution.vectorized.WritableColumnVector => !w.hasDictionary
        case _ => true
      }
    }.collect().exists(identity)
    assert(sawPlain, "corpus failed to defeat dictionary encoding; test is vacuous")
    val want = rowsOf(graft.queries.Relational.q7(spark, tmp))
    val got = rowsOf(graft.queries.Relational.q7ColumnarKernel(spark, tmp))
    assert(got === want)
  }

  test("kernels handle ALL-null columns (flag, measure, date) == declarative") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("allnull").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = ts("1995-01-01 00:00:00")
    // l_returnflag and l_quantity are null in EVERY row: the per-batch
    // anyNull short-circuit must not mask the all-null vector case
    val rows = (1L to 50L).map { i =>
      Row(i, 1L, 1L, 1, null, (i * 10).toDouble, 0.1, 0.0, null, "F", in)
    }
    spark.createDataFrame(rows.asJava, schema)
      .repartition(3).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    assert(rowsOf(graft.queries.Relational.q1ColumnarKernel(spark, tmp)) ===
      rowsOf(graft.queries.Relational.q1(spark, tmp)), "q1 kernel")
    val got7 = rowsOf(graft.queries.Relational.q7ColumnarKernel(spark, tmp))
    val want7 = rowsOf(graft.queries.Relational.q7(spark, tmp))
    assert(got7.groupBy(identity).view.mapValues(_.size).toMap ===
      want7.groupBy(identity).view.mapValues(_.size).toMap, "q7 kernel")
  }

  test("LongAccMap matches a reference HashMap across growth, incl. key 0 and negatives") {
    val rnd = new scala.util.Random(42)
    val m = new LongAccMap(2, initCap = 8)
    val ref = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    val keys = (Seq(0L, -1L, Long.MinValue >> 20, 1L << 40) ++
      Seq.fill(5000)(rnd.nextLong() >> rnd.nextInt(40))).toArray
    for (k <- keys; _ <- 0 to rnd.nextInt(3)) {
      val base = m.slot(k)
      m.values(base) += 1L
      m.values(base + 1) += k
      val (c, s) = ref.getOrElse(k, (0L, 0L))
      ref(k) = (c + 1L, s + k)
    }
    assert(m.size === ref.size)
    var seen = 0
    m.foreachEntry { (k, base) =>
      assert(ref(k) === ((m.values(base), m.values(base + 1))), s"key $k")
      seen += 1
    }
    assert(seen === ref.size)
  }
}
