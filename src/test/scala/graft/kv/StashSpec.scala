package graft.kv

import graft.SparkSpec
import java.nio.file.Files

/** KV property tests (SURVEY.md §5.2 item 3): biggie Stash semantics over
  * the Parquet-backed implementation.
  */
class StashSpec extends SparkSpec {

  private def e(k: String, v: Double*) = Entity(
    key = k,
    tensors = Map("x" -> v.toArray),
    shapes = Map("x" -> Array(v.length)),
    scalars = Map("n" -> v.length.toDouble),
    strings = Map("name" -> s"entity-$k"))

  test("get(add(s,k,e), k) == e") {
    val s = Stash.empty(spark).add(e("a", 1, 2, 3))
    val got = s.get("a").get
    assert(got.key == "a")
    assert(got.tensors("x").toSeq == Seq(1.0, 2.0, 3.0))
    assert(got.shapes("x").toSeq == Seq(3))
    assert(got.strings("name") == "entity-a")
  }

  test("add without overwrite on existing key fails; with overwrite wins") {
    val s = Stash.empty(spark).add(e("a", 1))
    intercept[IllegalArgumentException] { s.add(e("a", 9)) }
    val s2 = s.add(e("a", 9), overwrite = true)
    assert(s2.get("a").get.tensors("x").toSeq == Seq(9.0))
    assert(s2.count() == 1)
  }

  test("remove -> get misses; other keys unaffected") {
    val s = Stash.fromEntities(spark, Seq(e("a", 1), e("b", 2))).remove("a")
    assert(s.get("a").isEmpty)
    assert(s.get("b").isDefined)
    assert(s.count() == 1)
  }

  test("keys() == inserted set") {
    val ks = (0 until 20).map(i => s"k$i")
    val s = Stash.fromEntities(spark, ks.map(k => e(k, 1)))
    assert(s.keys.collect().map(_.getString(0)).toSet == ks.toSet)
  }

  test("roundtrip through bucketed parquet write/read") {
    val dir = Files.createTempDirectory("stash").toString + "/st"
    val es = (0 until 50).map(i => e(s"k$i", i.toDouble, i + 0.5))
    Stash.fromEntities(spark, es).save(dir, buckets = 4)
    val re = Stash.open(spark, dir)
    assert(re.count() == 50)
    val got = re.get("k7").get
    assert(got.tensors("x").toSeq == Seq(7.0, 7.5))
    assert(got.scalars("n") == 2.0)
  }

  test("saved files carry a key bloom filter; point lookups hit and miss correctly") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("stash-bloom").toString
    val es = (1 to 200).map(i => e(s"k$i", i.toDouble))
    Stash.fromEntities(spark, es).save(dir, buckets = 4)
    // every data file's footer must expose a bloom filter for `key` — the
    // point-lookup index that prunes row groups where min/max stats can't
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    var hitGroups = 0    // row groups whose filter admits the written key
    var missGroups = 0   // row groups whose filter rejects the absent key
    var groups = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          groups += 1
          val keyCol = block.getColumns.asScala
            .find(_.getPath.toDotString == "key")
            .getOrElse(fail(s"no key column chunk in ${f.getName}"))
          val bf = reader.getBloomFilterDataReader(block).readBloomFilter(keyCol)
          assert(bf != null, s"no bloom filter on key in ${f.getName}")
          def probes(s: String): Boolean =
            bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromString(s)))
          if (probes("k17")) hitGroups += 1
          if (!probes("definitely-never-written")) missGroups += 1
        }
      } finally reader.close()
    }
    // the written key probes positive SOMEWHERE (its bucket's group) but
    // the filters are selective: a miss lookup skips every row group, and
    // the hit key's hash-bucketed layout means most groups reject it too
    assert(hitGroups >= 1, "written key must probe positive in its bucket")
    assert(hitGroups < groups, "filters must be selective across buckets")
    assert(missGroups === groups, "an absent key must be rejected by every row group")
    val st = Stash.open(spark, dir)
    assert(st.get("k17").map(_.tensors("x").toSeq) === Some(Seq(17.0)))
    assert(st.get("nope") === None)
  }

  test("dynamic per-entity fields: heterogeneous maps coexist") {
    val a = Entity("a", tensors = Map("cqt" -> Array(1.0)), shapes = Map("cqt" -> Array(1)))
    val b = Entity("b", scalars = Map("tempo" -> 120.0))
    val s = Stash.fromEntities(spark, Seq(a, b))
    assert(s.get("a").get.tensors.contains("cqt"))
    assert(s.get("b").get.tensors.isEmpty)
    assert(s.get("b").get.scalars("tempo") == 120.0)
  }

  test("field() reads one field across entities (lazy column access)") {
    val s = Stash.fromEntities(spark, Seq(e("a", 1, 2), e("b", 3)))
    val xs = s.field("x").collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(xs == Map("a" -> Seq(1.0, 2.0), "b" -> Seq(3.0)))
  }

  test("addAll upsert is last-writer-wins per key") {
    import spark.implicits._
    val s = Stash.fromEntities(spark, Seq(e("a", 1), e("b", 2)))
      .addAll(spark.createDataset(Seq(e("b", 99), e("c", 3))))
    assert(s.count() == 3)
    assert(s.get("b").get.tensors("x").toSeq == Seq(99.0))
  }

  test("openLatest skips uncommitted (no _SUCCESS) version dirs") {
    val root = java.nio.file.Files.createTempDirectory("stashver").toString
    Stash.fromEntities(spark, Seq(Entity("a", scalars = Map("x" -> 1.0))))
      .save(s"$root/v0")
    Stash.fromEntities(spark, Seq(Entity("a", scalars = Map("x" -> 2.0))))
      .save(s"$root/v1")
    // fake a crashed half-written newer version: directory, no _SUCCESS
    val partial = new java.io.File(s"$root/v2")
    assert(partial.mkdir())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/v2/part-garbage"),
      Array[Byte](1, 2, 3))
    val (st, v) = Stash.openLatest(spark, root)
    assert(v == 1L, s"picked version $v instead of the last committed one")
    assert(st.get("a").get.scalars("x") == 2.0)
  }

  test("compactLatest: same contents, bucketed file count, next version; gc keeps it openable") {
    val root = java.nio.file.Files.createTempDirectory("stashcomp").toString
    val ents = (1 to 20).map(i => Entity(s"k$i", scalars = Map("x" -> i.toDouble)))
    // many-file layout: each save is a separate "batch" of the store
    Stash.fromEntities(spark, ents.take(10)).save(s"$root/v0")
    Stash.fromEntities(spark, ents).save(s"$root/v1", buckets = 16)
    val newV = Stash.compactLatest(spark, root, buckets = 2)
    assert(newV == 2L)
    val parts = new java.io.File(s"$root/v2").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts <= 2, s"$parts parquet files after compaction to 2 buckets")
    val (st, v) = Stash.openLatest(spark, root)
    assert(v == 2L)
    assert(st.count() == 20)
    assert(st.get("k7").get.scalars("x") == 7.0)
    // old layouts are now garbage; the compacted version must survive alone
    Stash.gcVersions(spark, root, keepFrom = 2L)
    assert(!new java.io.File(s"$root/v0").exists())
    val (st2, v2) = Stash.openLatest(spark, root)
    assert(v2 == 2L && st2.count() == 20)
    // empty root: no committed version to compact
    val bare = java.nio.file.Files.createTempDirectory("stashcomp-empty").toString
    assert(Stash.compactLatest(spark, bare, buckets = 2) == -1L)
  }
}
