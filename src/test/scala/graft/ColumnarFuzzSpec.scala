package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.jdk.CollectionConverters._

/** Generator-driven parity fuzz for the columnar seam (r13 verdict item
  * 7): where ColumnarKernelSpec pins CRAFTED corpora, this suite drives
  * GENERATED ones — random null patterns on every column, random string
  * cardinality (dictionary-encoded vs plain vs mid-file dictionary
  * fallback), random file counts and random vectorized-reader batch sizes
  * (3/17/50 rows force batch-boundary splits inside every row group) —
  * through three kernels against their declarative twins:
  *
  *  - q1  (lineitem): StringIdInterner packed 2-key groups + per-sum NULL
  *    skip semantics + date-band filter through LongAccMap accumulators;
  *  - q10 (events):   JSON probe + interner group keys + null/missing/
  *    malformed props;
  *  - q11 (events):   day-truncation arithmetic + (day, type) packed keys
  *    through LongAccMap.
  *
  * Every iteration compares FULL collected rows (order, types, rounded
  * values) — the same contract the DuckDB hash gate enforces. Seeds are
  * fixed: failures reproduce.
  */
class ColumnarFuzzSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  private def sample[A](g: Gen[A], seed: Long): A = {
    var i = 0L
    var r = g.apply(Gen.Parameters.default, Seed(seed))
    while (r.isEmpty && i < 100) { i += 1; r = g.apply(Gen.Parameters.default, Seed(seed + 7919 * i)) }
    r.getOrElse(throw new IllegalStateException("generator exhausted"))
  }

  /** One generated writer/reader regime: encoding + layout + batch split. */
  private case class Regime(dict: Boolean, tinyDictPage: Boolean,
      batchSize: Int, files: Int) {
    override def toString =
      s"dict=$dict tinyPage=$tinyDictPage batch=$batchSize files=$files"
  }
  private val regimeGen: Gen[Regime] = for {
    dict <- Gen.oneOf(true, false)
    tiny <- Gen.oneOf(true, false)
    bs <- Gen.oneOf(3, 17, 50, 4096)
    files <- Gen.chooseNum(1, 4)
  } yield Regime(dict, tiny && dict, bs, files)

  private def writeParquet(df: org.apache.spark.sql.DataFrame, path: String,
      r: Regime): Unit = {
    val w = df.repartition(r.files).write.mode("overwrite")
      .option("parquet.enable.dictionary", r.dict.toString)
      .option("parquet.page.size", "512")
    (if (r.tinyDictPage) w.option("parquet.dictionary.page.size", "64") else w)
      .parquet(path)
  }

  private val batchSizeKey = "spark.sql.parquet.columnarReaderBatchSize"
  private def withBatchSize[A](n: Int)(f: => A): A = {
    val saved = spark.conf.get(batchSizeKey, "4096")
    spark.conf.set(batchSizeKey, n.toString)
    try f finally spark.conf.set(batchSizeKey, saved)
  }

  /** null `p` times in 10, else a draw from `g` (boxed for Row varargs). */
  private def orNull[A](g: Gen[A], p: Int): Gen[Any] =
    Gen.frequency((p, Gen.const(null: Any)), (10 - p, g.map(_.asInstanceOf[Any])))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // string pools: low-card stays dictionary-encoded; high-card forces
  // plain encoding / mid-file dictionary fallback under the tiny page
  private def stringGen(highCard: Boolean): Gen[String] =
    if (highCard) Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    else Gen.oneOf("A", "N", "R", "zz", "")

  test("q1 kernel == declarative under generated nulls/encodings/batch splits") {
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    val dates = Seq(ts("1995-01-01 00:00:00"), ts("1998-08-01 00:00:00"),
      ts("1999-01-01 00:00:00")) // straddle the shipdate band
    def corpus(pNull: Int, highCard: Boolean): Gen[List[Row]] = {
      val row = for {
        ok <- Gen.chooseNum(1L, 1000000L)
        q <- orNull(Gen.chooseNum(1, 5000).map(_ / 100.0), pNull)
        ep <- orNull(Gen.chooseNum(1, 900000).map(_ / 100.0), pNull)
        di <- orNull(Gen.chooseNum(0, 10).map(_ / 100.0), pNull)
        rf <- orNull(stringGen(highCard), pNull)
        st <- orNull(stringGen(highCard), pNull)
        sd <- orNull(Gen.oneOf(dates), pNull)
      } yield Row(ok, q, ep, di, rf, st, sd)
      Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, row))
    }
    for (i <- 0 until 6) {
      val regime = sample(regimeGen, 100L + i)
      val rows = sample(corpus(pNull = Seq(0, 1, 3)(i % 3), highCard = i % 2 == 1), 200L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzq1_$i").toString
      writeParquet(spark.createDataFrame(rows.asJava, schema), s"$tmp/lineitem.parquet", regime)
      withBatchSize(regime.batchSize) {
        val want = rowsOf(graft.queries.Relational.q1(spark, tmp))
        val got = rowsOf(graft.queries.Relational.q1ColumnarKernel(spark, tmp))
        assert(got === want, s"iteration $i ($regime, ${rows.size} rows)")
      }
    }
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventsCorpus(pNull: Int, highCard: Boolean): Gen[List[Row]] = {
    val days = Seq("2024-01-01", "2024-01-02", "2024-03-15")
    val propsGen: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-3000000000L, 3000000000L).map(n => s"""{"k": $n}"""),
      Gen.const("""{"x": 1}"""),           // key missing → all-null group
      Gen.const("""{"k": "oops"}"""),      // non-numeric → null
      Gen.const("""{"""),                  // malformed
      Gen.const("""{"k": 3.7}"""))
    val row = for {
      eid <- Gen.chooseNum(1L, 1000000L)
      t <- orNull(for {
        d <- Gen.oneOf(days); h <- Gen.chooseNum(0, 23); m <- Gen.chooseNum(0, 59)
      } yield ts(f"$d $h%02d:$m%02d:00"), pNull)
      uid <- Gen.chooseNum(1L, 50L)
      et <- orNull(stringGen(highCard), pNull)
      v <- orNull(Gen.chooseNum(0, 10000).map(_ / 100.0), pNull)
      pr <- orNull(propsGen, pNull)
    } yield Row(eid, t, uid, et, v, pr)
    Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, row))
  }

  test("q10 kernel == declarative under generated nulls/encodings/batch splits") {
    for (i <- 0 until 6) {
      val regime = sample(regimeGen, 300L + i)
      val rows = sample(eventsCorpus(pNull = Seq(0, 1, 3)(i % 3), highCard = i % 2 == 1), 400L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzq10_$i").toString
      writeParquet(spark.createDataFrame(rows.asJava, eventsSchema), s"$tmp/events.parquet", regime)
      withBatchSize(regime.batchSize) {
        val want = rowsOf(graft.queries.Events.q10(spark, tmp))
        val got = rowsOf(graft.queries.Events.q10ColumnarKernel(spark, tmp))
        assert(got === want, s"iteration $i ($regime, ${rows.size} rows)")
      }
    }
  }

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsCorpus(pNull: Int): Gen[List[Row]] = {
    // text mix: duplicates (the dedup path), whitespace/punct-heavy,
    // unicode beyond the BMP, empty, and random prose-ish strings
    val textGen: Gen[String] = Gen.frequency(
      (3, Gen.const("the same duplicated document text")),
      (1, Gen.const("")),
      (1, Gen.const("   \t  ")),
      (1, Gen.const("émoji 😀 and ünïcode—dashes…")),
      (6, Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.const(',')),
        (1, Gen.numChar))).map(_.mkString))))
    val row = for {
      id <- Gen.chooseNum(1L, 1000000L)
      t <- orNull(textGen, pNull)
      lg <- orNull(Gen.oneOf("en", "de", "fr"), pNull)
      src <- orNull(Gen.oneOf("web", "book"), pNull)
      nc <- orNull(Gen.chooseNum(0L, 500L), pNull)
    } yield Row(id, t, lg, src, nc)
    Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, row))
  }

  test("q14/q17 kernels == declarative on generated text corpora (dups, unicode, nulls)") {
    for (i <- 0 until 6) {
      val regime = sample(regimeGen, 700L + i)
      val rows = sample(docsCorpus(pNull = Seq(0, 1, 3)(i % 3)), 800L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzdocs_$i").toString
      writeParquet(spark.createDataFrame(rows.asJava, docsSchema), s"$tmp/documents.parquet", regime)
      withBatchSize(regime.batchSize) {
        assert(rowsOf(graft.queries.TextVec.q14ColumnarKernel(spark, tmp)) ===
          rowsOf(graft.queries.TextVec.q14(spark, tmp)),
          s"q14 iteration $i ($regime, ${rows.size} rows)")
        assert(rowsOf(graft.queries.TextVec.q17ColumnarKernel(spark, tmp)) ===
          rowsOf(graft.queries.TextVec.q17(spark, tmp)),
          s"q17 iteration $i ($regime, ${rows.size} rows)")
      }
    }
  }

  test("q11 kernel == declarative under generated nulls/encodings/batch splits") {
    for (i <- 0 until 6) {
      val regime = sample(regimeGen, 500L + i)
      val rows = sample(eventsCorpus(pNull = Seq(0, 1, 3)(i % 3), highCard = i % 2 == 1), 600L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzq11_$i").toString
      writeParquet(spark.createDataFrame(rows.asJava, eventsSchema), s"$tmp/events.parquet", regime)
      withBatchSize(regime.batchSize) {
        val want = rowsOf(graft.queries.Events.q11(spark, tmp))
        val got = rowsOf(graft.queries.Events.q11ColumnarKernel(spark, tmp))
        assert(got === want, s"iteration $i ($regime, ${rows.size} rows)")
      }
    }
  }

  // r17: the q9a/q4 finales moved to KernelFinale.aggregate (single-stage
  // runJob + driver merge under the gate) — fuzz BOTH kernels against
  // their declarative twins, q9a on both id widths (testdata ships dims
  // as INTEGER, facts as BIGINT) and on BOTH finale branches (the forced
  // distributed path via a 1-byte broadcast threshold).

  test("q9a kernel == declarative: null/width fuzz, both finale branches") {
    val longSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val intSchema = StructType(longSchema.map(f =>
      if (f.name == "user_id") f.copy(dataType = IntegerType) else f))
    def corpus(pNull: Int, intWidth: Boolean): Gen[List[Row]] = {
      val row = for {
        eid <- Gen.chooseNum(1L, 1000000L)
        t <- Gen.const(ts("2024-01-01 10:00:00"))
        uid <- orNull(Gen.chooseNum(1L, 40L).map(u =>
          if (intWidth) Int.box(u.toInt) else Long.box(u)), pNull)
        et <- orNull(stringGen(highCard = false), pNull)
        v <- orNull(Gen.chooseNum(0, 100).map(_ / 10.0), pNull)
        pr <- Gen.const("""{"k": 1}""")
      } yield Row(eid, t, uid, et, v, pr)
      Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, row))
    }
    for (i <- 0 until 6) {
      val intWidth = i % 2 == 1
      val regime = sample(regimeGen, 700L + i)
      val rows = sample(corpus(pNull = Seq(0, 1, 3)(i % 3), intWidth), 800L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzq9a_$i").toString
      writeParquet(
        spark.createDataFrame(rows.asJava, if (intWidth) intSchema else longSchema),
        s"$tmp/events.parquet", regime)
      withBatchSize(regime.batchSize) {
        val want = rowsOf(graft.queries.Events.q9a(spark, tmp))
        assert(rowsOf(graft.queries.Events.q9aColumnarKernel(spark, tmp)) === want,
          s"iteration $i gated branch ($regime, ${rows.size} rows)")
        // forced DISTRIBUTED finale: a 1-byte threshold fails the bound
        // probe, so the kernel counts via per-partition-distinct shuffle
        val key = "spark.sql.autoBroadcastJoinThreshold"
        val saved = spark.conf.get(key)
        spark.conf.set(key, "1")
        try assert(rowsOf(graft.queries.Events.q9aColumnarKernel(spark, tmp)) === want,
          s"iteration $i distributed branch ($regime)")
        finally spark.conf.set(key, saved)
      }
    }
  }

  test("q4 kernel == declarative under generated null custkeys") {
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType)))
    val customerSchema = StructType(Seq(StructField("c_custkey", LongType)))
    def ordersCorpus(pNull: Int): Gen[List[Row]] = {
      val row = for {
        ok <- Gen.chooseNum(1L, 1000000L)
        ck <- orNull(Gen.chooseNum(1L, 60L), pNull)
      } yield Row(ok, ck)
      Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, row))
    }
    def customerCorpus(pNull: Int): Gen[List[Row]] = {
      val row = orNull(Gen.chooseNum(1L, 80L), pNull).map(ck => Row(ck))
      Gen.chooseNum(1, 200).flatMap(n => Gen.listOfN(n, row))
    }
    for (i <- 0 until 6) {
      val regime = sample(regimeGen, 900L + i)
      val orders = sample(ordersCorpus(pNull = Seq(0, 1, 3)(i % 3)), 1000L + i)
      val custs = sample(customerCorpus(pNull = Seq(0, 3, 1)(i % 3)), 1100L + i)
      val tmp = java.nio.file.Files.createTempDirectory(s"fuzzq4_$i").toString
      writeParquet(spark.createDataFrame(orders.asJava, ordersSchema),
        s"$tmp/orders.parquet", regime)
      writeParquet(spark.createDataFrame(custs.asJava, customerSchema),
        s"$tmp/customer.parquet", regime)
      withBatchSize(regime.batchSize) {
        val want = rowsOf(graft.queries.Relational.q4(spark, tmp))
        val got = rowsOf(graft.queries.Relational.q4ColumnarKernel(spark, tmp))
        assert(got === want, s"iteration $i ($regime, ${orders.size}o/${custs.size}c)")
      }
    }
  }
}
