package graft

import graft.functions.KmvDistinct
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink roundtrips (SURVEY rows 2–3), scalar-UDF registration
  * surface (row 44), and the KMV typed-Aggregator UDAF (row 45).
  */
class SourcesAndUdfSpec extends SparkSpec {

  test("CSV roundtrip preserves rows and schema") {
    val dir = Files.createTempDirectory("src").toString
    val nation = Tables.nation(spark, sf0001)
    Sources.writeCsv(nation, s"$dir/nation_csv")
    val re = Sources.readCsv(spark, s"$dir/nation_csv", nation.schema)
    assert(re.count() == nation.count())
    assert(re.exceptAll(nation).isEmpty)
  }

  test("JSON-lines roundtrip preserves rows") {
    val dir = Files.createTempDirectory("src").toString
    val region = Tables.region(spark, sf0001)
    Sources.writeJsonLines(region, s"$dir/region_json")
    val re = Sources.readJsonLines(spark, s"$dir/region_json", region.schema)
    assert(re.exceptAll(region).isEmpty && region.exceptAll(re).isEmpty)
  }

  test("partitioned parquet write prunes partitions at read") {
    val dir = Files.createTempDirectory("src").toString
    Sources.writeParquet(Tables.orders(spark, sf0001), s"$dir/orders_p",
      partitionBy = Seq("o_orderstatus"))
    val re = Sources.readParquet(spark, s"$dir/orders_p")
      .filter(col("o_orderstatus") === "F")
    // partition pruning: the plan's partition filters mention the column
    val plan = re.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"))
    assert(re.count() > 0)
  }

  test("ORC roundtrip preserves rows; filter pushes to the ORC scan") {
    val dir = Files.createTempDirectory("src").toString
    val orders = Tables.orders(spark, sf0001)
    Sources.writeOrc(orders, s"$dir/orders_orc")
    val re = Sources.readOrc(spark, s"$dir/orders_orc")
    assert(re.exceptAll(orders).isEmpty && orders.exceptAll(re).isEmpty)
    val filtered = re.filter(col("o_totalprice") > 100000).select("o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("binaryFile source: one row per file with path/length/content") {
    val dir = Files.createTempDirectory("src").toString
    val bytes = Array[Byte](1, 2, 3, 4, 5)
    Files.write(java.nio.file.Paths.get(dir, "a.bin"), bytes)
    Files.write(java.nio.file.Paths.get(dir, "b.bin"), Array[Byte](9))
    val df = Sources.readBinaryFiles(spark, dir, "*.bin")
    val rows = df.select("path", "length", "content").collect()
    assert(rows.length == 2)
    val a = rows.find(_.getString(0).endsWith("a.bin")).get
    assert(a.getLong(1) == 5L && a.getAs[Array[Byte]](2).toSeq == bytes.toSeq)
  }

  test("scalar UDF registration surface works (spark.udf.register)") {
    // kept deliberately tiny: UDFs are a last resort (SURVEY §2.2 row 44) —
    // every engine operator uses native columns/expressions instead
    spark.udf.register("graft_clip", (x: Double, lo: Double, hi: Double) =>
      math.max(lo, math.min(hi, x)))
    Tables.region(spark, sf0001).createOrReplaceTempView("region_udf_t")
    val r = spark.sql("SELECT graft_clip(CAST(r_regionkey AS DOUBLE), 1.0, 3.0) c FROM region_udf_t")
      .agg(min("c"), max("c")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 3.0)
  }

  test("KMV sketch estimates distinct user_id within 15% and is deterministic") {
    import spark.implicits._
    val users = Tables.events(spark, sf001).select("user_id").as[Long]
    val est1 = users.select(KmvDistinct(256)).head()
    val est2 = users.repartition(13).select(KmvDistinct(256)).head()
    val exact = users.distinct().count().toDouble
    assert(est1 == est2, "sketch must be deterministic under repartitioning")
    assert(math.abs(est1 - exact) / exact < 0.15,
      s"estimate $est1 vs exact $exact")
  }

  test("KMV sketch is exact below k") {
    import spark.implicits._
    val small = spark.createDataset((1L to 100L) ++ (1L to 100L))
    assert(small.select(KmvDistinct(256)).head() == 100.0)
  }

  test("KMV estimate stays sane in the k..2k band (signed-hash regression)") {
    import spark.implicits._
    // n_distinct = 300 with k=256: the k-th smallest hash is likely in the
    // positive signed half — the old signed conversion returned negative
    // estimates here
    val ds = spark.createDataset((1L to 300L))
    val est = ds.select(KmvDistinct(256)).head()
    assert(est > 0, s"estimate must be positive, got $est")
    assert(math.abs(est - 300.0) / 300.0 < 0.25, s"estimate $est too far from 300")
  }
}
