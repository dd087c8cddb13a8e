package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.expressions.TextVecExprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text/vector queries (SURVEY.md §2.2 rows 27–28, 31, 34–38, 46):
  * exact dedup, MinHash-LSH near-dup with exact Jaccard verify, cosine
  * top-k similarity search, token analytics, embedding stats.
  *
  * Per-row math runs as either native Column combinators or the custom
  * single-pass expressions in graft.expressions (hot paths) — never UDFs.
  */
object TextVec {

  /** The columnar kernels' pruned input frames (drift-proofing for
    * [[graft.Exec]]'s validity bounds, r13 review).
    */
  private[graft] def docsTextInput(s: SparkSession, d: String): DataFrame =
    graft.operators.ColumnarScan.inputCached(s, d, "docsTextInput") {
      Tables.documents(s, d).select(col("text"))
    }
  private[graft] def q16KernelInput(s: SparkSession, d: String): DataFrame =
    graft.operators.ColumnarScan.inputCached(s, d, "q16KernelInput") {
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    }
  private[graft] def q16QueryFrame(s: SparkSession, d: String): DataFrame =
    graft.operators.ColumnarScan.inputCached(s, d, "q16QueryFrame") {
      Tables.embeddings(s, d).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))

    }
  /** Q14 exact dedup count on normalized text — distinct over a 128-BIT
    * fingerprint of the normalized string, not the string itself:
    * count(DISTINCT) plans as a two-stage partial/final hash aggregate
    * whose exchange carries the distinct VALUES, so hashing first cuts the
    * shuffled bytes from document length (unbounded) to 16 bytes per
    * distinct doc — the difference between shuffling the corpus and
    * shuffling a fingerprint column at 100 TB. The fingerprint is TWO
    * seeded XxHash64 passes (r16: md5 paid ~10× the per-byte cost for
    * crypto strength dedup counting never needed — the r12d slope window
    * put q14's data term at 1.43× the oracle, and hashing was the
    * per-byte dominator); collision expectation stays the md5 class
    * (~n²/2¹²⁹: ~4e-17 at 10¹⁰ docs). TextVecSpec pins equality against
    * the direct string-distinct count.
    */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.TextVecExprs.xxhash64Seeded
    val canon = lower(trim(col("text")))
    // NULL text must stay skipped by countDistinct exactly as md5(null)
    // was: hash functions fold a null input as a no-op (xxhash64(null) =
    // seed, NOT null), so the null-ness is re-asserted around the struct
    val fp = when(col("text").isNotNull, struct(
      xxhash64Seeded(canon, 42L),
      xxhash64Seeded(canon, 0x9E3779B97F4A7C15L)))
    Tables.documents(spark, dir).agg(countDistinct(fp).as("n"))
  }

  /** The direct string-distinct spelling — the semantic cross-check for
    * q14's fingerprint form (and the literal oracle shape).
    */
  def q14Direct(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .agg(countDistinct(lower(trim(col("text")))).as("n"))

  /** [[q14]] on the columnar seam (driver-gated as q113 on q14's oracle):
    * exact dedup census as one single-stage pass. Per row the kernel
    * applies the SAME canonicalization as q14 — `UTF8String.trim()` then
    * `.toLowerCase()` (the exact methods Spark's trim/lower call) — and
    * fingerprints the resulting bytes with two seeded XXH64 passes
    * (Spark's own codegen hash kernel; q14's fingerprint basis, r16 —
    * ~10× cheaper per byte than the previous MessageDigest md5 at the
    * same n²/2¹²⁹ collision class); each partition keeps a set of the
    * 128-bit fingerprints. The declarative q14's two-stage distinct
    * costs ~2 dispatch floors for a 5 000-row corpus whose hashing is
    * milliseconds — the kernel fixes the job count AND the per-byte
    * term.
    *
    * Driver boundedness (r12 verdict): the single-stage driver-union
    * finale runs ONLY when the documents scan sits inside the broadcast
    * regime ([[Relational.withinBroadcastBound]] — distinct digests ≤
    * 16 B · rows ≤ text bytes, so the gate bounds the union). Past the
    * gate the kernel keeps its canonicalize+hash scan but counts
    * DISTRIBUTED: per-partition-distinct digests (16 B apiece — never the
    * corpus) shuffle through `distinct().count()` and the driver receives
    * one long.
    */
  def q14ColumnarKernel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val docs = docsTextInput(spark, dir)
    val driverFinaleOk = graft.queries.Relational.withinBroadcastBound(docs)
    val (batches, schema) = graft.operators.ColumnarScan.batches(docs)
    val txtIdx = schema.fieldIndex("text")
    val partials = batches.mapPartitions { it =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val seen = new java.util.HashSet[(Long, Long)]()
      while (it.hasNext) {
        val b = it.next()
        val n = b.numRows()
        val tV = b.column(txtIdx)
        val anyNull = tV.hasNull
        var i = 0
        while (i < n) {
          // countDistinct skips NULL inputs — match q14's null guard
          if (!(anyNull && tV.isNullAt(i))) {
            val canon = tV.getUTF8String(i).trim().toLowerCase()
            // hash the UTF8String's own backing bytes — no copy
            val h0 = XXH64.hashUnsafeBytes(
              canon.getBaseObject, canon.getBaseOffset, canon.numBytes, 42L)
            val h1 = XXH64.hashUnsafeBytes(
              canon.getBaseObject, canon.getBaseOffset, canon.numBytes,
              0x9E3779B97F4A7C15L)
            seen.add((h0, h1))
          }
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      Iterator.single(seen.asScala.toArray)
    }
    val n: Long = if (driverFinaleOk) {
      val all = new java.util.HashSet[(Long, Long)]()
      partials.collect().foreach(_.foreach(all.add))
      all.size.toLong
    } else {
      partials.flatMap(_.iterator).distinct().count()
    }
    val outSchema = StructType(Seq(StructField("n", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(Row(n)).asJava, outSchema)
  }

  // LSH parameters for q15: 16 hashes = 8 bands x 2 rows. At the Jaccard
  // threshold 0.6 a pair is banded with p = 1-(1-0.6^2)^8 = 0.97; the
  // corpus's true dups are all J >= 0.83 (measured) => banding + the 6/16
  // signature prefilter miss with p ~ 1e-7. The hash family is fixed, so
  // recall is deterministic per dataset — proven equal to brute force at
  // sf0.001/sf0.01 (NearDupSpec) and sf0.1 (one-off 446 s brute run).
  private[graft] val MinHashes = 16
  private[graft] val Bands = 8

  /** Shingle-set projection of documents: (doc_id, sg). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 8).as("sg"))

  /** Exact-verify + output canonicalization shared by LSH and brute paths.
    * The >= 0.6 filter is on the UNROUNDED Jaccard (matching the oracle);
    * int/int division is exact in double, so both engines agree bit-wise.
    */
  private def verified(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("jraw",
        // try_divide: two empty shingle sets give 0/0 -> NULL (filtered),
        // instead of an ANSI DIVIDE_BY_ZERO error — same rule as
        // ShingleJaccard and the DuckDB oracle
        try_divide(
          size(array_intersect(col("sga"), col("sgb"))).cast("double"),
          size(array_union(col("sga"), col("sgb"))).cast("double")))
      .filter(col("jraw") >= 0.6)
      .select(col("ida"), col("idb"), round(col("jraw"), 4).as("j"))
      .orderBy("ida", "idb")

  /** Q15 near-dup pairs: MinHash-LSH candidate generation + exact Jaccard
    * verify (deterministic output; LSH only prunes the pair space). The
    * minhash/banding and the exact verify run as custom single-pass JVM
    * expressions (graft.expressions) — the HOF formulation cost ~150 s at
    * sf0.1; this one runs in ~2 s.
    *
    * Scale shape: explode docs to (band, bandKey) — 8 rows/doc — self-join
    * on the band key (shuffle on (band, key), never a cross join), dedupe
    * candidate id-pairs, then re-join the two shingle sets and verify.
    * At 100 TB the band-bucket join is the bottleneck if a bucket gets hot;
    * mitigations (not needed at test scale): cap bucket size, increase
    * rowsPerBand, or salt the verify join.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // localCheckpoint materializes the (doc_id, sig, band, bkey) projection
    // ONCE (a few MB); without it both sides of the self-join recompute the
    // minhash scan. Same pattern a 100 TB run would use, with a persisted
    // signature table instead.
    val keys = docs
      .select(col("doc_id"), TextVecExprs.minHashSig(col("text"), 8, MinHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(TextVecExprs.bandKeysFromSig(col("sig"), Bands)).as(Seq("band", "bkey")))
      .localCheckpoint()
    // Candidate pairs carry both signatures (128 B each), so a cheap
    // estimated-Jaccard prefilter (>= 6/16 agreeing positions) runs INSIDE
    // the band join before any dedup or text fetch: background pairs
    // (J ~ 0.1, E[matches] ~ 1.6) vanish here, while a true J >= 0.92 pair
    // survives with miss probability ~1e-10 (Binom(16, 0.92) <= 5). The
    // exact verify then touches only a few hundred pairs instead of ~200k.
    val cand = keys.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(TextVecExprs.sigMatchCount(col("x.sig"), col("y.sig")) >= 6)
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    val pairs = cand
      .join(docs.select(col("doc_id").as("ida"), col("text").as("ta")), "ida")
      .join(docs.select(col("doc_id").as("idb"), col("text").as("tb")), "idb")
    pairs
      .withColumn("jraw", TextVecExprs.shingleJaccard(col("ta"), col("tb"), 8))
      .filter(col("jraw") >= 0.6)
      .select(col("ida"), col("idb"), round(col("jraw"), 4).as("j"))
      .orderBy("ida", "idb")
  }

  /** Brute-force near-dup reference (O(n^2) shingle-set join); used by the
    * test suite to prove q15's LSH stage has recall 1.0 on this corpus.
    */
  def nearDupBrute(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingled(spark, dir)
    val pairs = docs.select(col("doc_id").as("ida"), col("sg").as("sga"))
      .crossJoin(docs.select(col("doc_id").as("idb"), col("sg").as("sgb")))
      .filter(col("ida") < col("idb"))
    verified(pairs)
  }

  /** Q16 cosine top-5 neighbors for query vectors vec_id < 10.
    *
    * The query side is tiny and explicitly broadcast: the scan of the full
    * embedding table streams past 10 in-memory query vectors (no shuffle of
    * the big side). Similarity is rounded to 6dp BEFORE ranking so float
    * noise cannot flip rank order across engines. The rank<=5 filter is
    * optimized by Spark's WindowGroupLimit into per-partition partial top-k
    * before the final per-qid shuffle.
    */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", TextVecExprs.floatVecNorm(col("embedding")))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
    // spread the single-file scan across cores before the broadcast probe
    val scored = emb.repartition(spark.sparkContext.defaultParallelism)
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(TextVecExprs.floatVecDot(col("qv"), col("embedding"))
          / (col("qn") * col("nrm")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** [[q16]] on the columnar seam (driver-gated as q111 on q16's oracle)
    * — the seam's first ARRAY-column kernel: Spark 4's vectorized parquet
    * reader keeps `array<float>` columnar, and `ColumnVector.getArray`
    * exposes the elements without row materialization. Per embedding row
    * the kernel computes the dot against each of the ≤10 broadcast query
    * vectors ([[graft.expressions.TextVecExprs.floatVecDot]]'s exact
    * double-accumulation order), rounds to 6dp FIRST (q16's rank
    * stability contract, HALF_UP like Spark's round; NaN/Inf pass through
    * as RoundBase does), and keeps a per-query (sim DESC, vec_id ASC)
    * top-5 — `java.lang.Double.compare` replicating Spark's double
    * ordering incl. NaN-greatest. Null-embedding rows produce NULL sims,
    * which rank LAST under DESC: a smallest-vec_id filler tier per query
    * preserves them exactly for corpora with fewer than 5 scorable
    * candidates. Bounded everywhere: 10 queries × (5 + 5) per partition.
    */
  private val q16QueryCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Array[Long], Array[Array[Float]], Array[Double])]()

  def q16ColumnarKernel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val k = 5
    // query side: same rows q16 broadcasts, collected with their norms
    // computed in the kernel's own double order (== FloatVecNorm's);
    // pay-once cached per (session, dir) — the Relational.buildCache /
    // Layouts discipline (testdata dirs are immutable, sessions
    // process-lived; correctness gates hash-check every call regardless)
    val (qids, qvecs, qnorms) = q16QueryCache.computeIfAbsent((spark, dir), { _ =>
      val qRows = q16QueryFrame(spark, dir).collect()
      val ids = qRows.map(_.getLong(0))
      val vecs: Array[Array[Float]] = qRows.map { r =>
        if (r.isNullAt(1)) null else r.getSeq[Float](1).toArray
      }
      val norms: Array[Double] = vecs.map { v =>
        if (v == null) Double.NaN
        else {
          var s = 0.0; var i = 0
          while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
          math.sqrt(s)
        }
      }
      (ids, vecs, norms)
    })
    val qNull: Array[Boolean] = qvecs.map(_ == null)
    val nq = qids.length
    val proj = q16KernelInput(spark, dir)
    val (batches, schema) = graft.operators.ColumnarScan.batches(proj)
    val idIdx = schema.fieldIndex("vec_id")
    val embIdx = schema.fieldIndex("embedding")
    val partials = batches.mapPartitions { it =>
      // per query: parallel arrays of the top-k (sim, vec_id), sorted
      // best-first, plus a smallest-vec_id null-sim filler tier
      val sims = Array.fill(nq)(new Array[Double](k))
      val vids = Array.fill(nq)(new Array[Long](k))
      val sizes = new Array[Int](nq)
      val nullTier = Array.fill(nq)(new Array[Long](k))
      val nullSizes = new Array[Int](nq)
      def beats(sa: Double, va: Long, sb: Double, vb: Long): Boolean = {
        val c = java.lang.Double.compare(sa, sb) // NaN greatest, like Spark
        if (c != 0) c > 0 else va < vb
      }
      while (it.hasNext) {
        val b = it.next()
        val n = b.numRows()
        val idV = b.column(idIdx); val eV = b.column(embIdx)
        val anyNull = idV.hasNull || eV.hasNull
        var i = 0
        while (i < n) {
          if (!(anyNull && idV.isNullAt(i))) { // null vec_id never joins
            val vid = idV.getLong(i)
            val arr = if (anyNull && eV.isNullAt(i)) null else eV.getArray(i)
            var qi = 0
            while (qi < nq) {
              if (vid != qids(qi)) { // the =!= self-pair exclusion
                if (arr == null || qNull(qi)) {
                  // NULL sim → desc-last tier, kept smallest-vec_id-first
                  val t = nullTier(qi)
                  val sz = nullSizes(qi)
                  if (sz < k || vid < t(sz - 1)) {
                    var p = 0
                    while (p < sz && t(p) < vid) p += 1
                    if (p < k) {
                      var j = Math.min(sz, k - 1)
                      while (j > p) { t(j) = t(j - 1); j -= 1 }
                      t(p) = vid
                      if (sz < k) nullSizes(qi) = sz + 1
                    }
                  }
                } else {
                  val q = qvecs(qi)
                  val m = Math.min(q.length, arr.numElements())
                  var s = 0.0
                  var j = 0
                  while (j < m) { s += q(j).toDouble * arr.getFloat(j).toDouble; j += 1 }
                  // norm of THIS row, FloatVecNorm's order
                  var nn = 0.0
                  val ne = arr.numElements()
                  j = 0
                  while (j < ne) { val x = arr.getFloat(j).toDouble; nn += x * x; j += 1 }
                  val raw = s / (qnorms(qi) * math.sqrt(nn))
                  val sim =
                    if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
                    else java.math.BigDecimal.valueOf(raw)
                      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                  val ss = sims(qi); val vv = vids(qi)
                  val sz = sizes(qi)
                  if (sz < k || beats(sim, vid, ss(sz - 1), vv(sz - 1))) {
                    var p = 0
                    while (p < sz && !beats(sim, vid, ss(p), vv(p))) p += 1
                    if (p < k) {
                      var j2 = Math.min(sz, k - 1)
                      while (j2 > p) { ss(j2) = ss(j2 - 1); vv(j2) = vv(j2 - 1); j2 -= 1 }
                      ss(p) = sim; vv(p) = vid
                      if (sz < k) sizes(qi) = sz + 1
                    }
                  }
                }
              }
              qi += 1
            }
          }
          i += 1
        }
      }
      val out = Vector.newBuilder[(Long, Int, Array[Double], Array[Long], Array[Long])]
      var qi = 0
      while (qi < nq) {
        out += ((qids(qi), sizes(qi),
          java.util.Arrays.copyOf(sims(qi), sizes(qi)),
          java.util.Arrays.copyOf(vids(qi), sizes(qi)),
          java.util.Arrays.copyOf(nullTier(qi), nullSizes(qi))))
        qi += 1
      }
      out.result().iterator
    }
    // driver merge per query: top-k of non-null sims, then null fillers
    case class Acc(sims: scala.collection.mutable.ArrayBuffer[(Double, Long)],
      nulls: scala.collection.mutable.ArrayBuffer[Long])
    val byQ = new java.util.LinkedHashMap[Long, Acc]()
    partials.collect().foreach { case (qid, sz, ss, vv, nt) =>
      val a = byQ.computeIfAbsent(qid,
        _ => Acc(scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty))
      var i = 0
      while (i < sz) { a.sims += ((ss(i), vv(i))); i += 1 }
      nt.foreach(a.nulls += _)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    qids.sorted.foreach { qid =>
      val a = byQ.get(qid)
      if (a != null) {
        val ranked = a.sims.sortWith { case ((sa, va), (sb, vb)) =>
          val c = java.lang.Double.compare(sa, sb)
          if (c != 0) c > 0 else va < vb
        }
        val fill = a.nulls.sorted
        val top = (ranked.map(p => (java.lang.Double.valueOf(p._1), p._2)) ++
          fill.map(v => (null: java.lang.Double, v))).take(k)
        top.foreach { case (s, v) => rows += Row(qid, v, s) }
      }
    }
    val outSchema = StructType(Seq(
      StructField("qid", LongType, nullable = true),
      StructField("vec_id", LongType, nullable = true),
      StructField("sim", DoubleType, nullable = true)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, outSchema)
  }

  /** Q17 top-20 token frequencies: explode → partial+final count agg →
    * global top-k (TakeOrderedAndProject; no full sort).
    */
  def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(20)

  /** [[q17]] on the columnar seam (driver-gated as q112 on q17's oracle):
    * token counting without the explode. The declarative form splits each
    * document into a token ROW apiece (~120× row inflation through the
    * row machinery) before the count agg; the kernel walks each text's
    * UTF-8 bytes once, splitting on the literal 0x20 — exactly
    * `split(text, " ")` + the non-empty filter, and safe on multibyte
    * text because 0x20 never occurs inside a UTF-8 sequence — and counts
    * tokens in a per-partition content-hash map. Partial vocab maps merge
    * on the driver and the (count DESC, token ASC) top-20 is taken there;
    * vocabulary ≪ corpus (Heaps' law) makes that exact and cheap at bench
    * scale.
    *
    * Driver boundedness (r12 verdict): the driver-merge finale runs ONLY
    * when the documents scan itself sits inside the broadcast regime
    * ([[Relational.withinBroadcastBound]] — vocab bytes ≤ text bytes, so
    * the gate bounds the merged map too). Past the gate the kernel keeps
    * its single explode-free scan but merges DISTRIBUTED: the per-partition
    * vocab partials reduceByKey (a vocab-sized shuffle, not a corpus-sized
    * one) and a lossless `takeOrdered(20)` under the exact output ordering
    * hands the driver exactly 20 rows — O(k) driver state at any scale.
    */
  def q17ColumnarKernel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.unsafe.types.UTF8String
    val docs = docsTextInput(spark, dir)
    val driverFinaleOk = graft.queries.Relational.withinBroadcastBound(docs)
    val (batches, schema) = graft.operators.ColumnarScan.batches(docs)
    val txtIdx = schema.fieldIndex("text")
    val partials = batches.mapPartitions { it =>
      val counts = new java.util.HashMap[UTF8String, Array[Long]]()
      while (it.hasNext) {
        val b = it.next()
        val n = b.numRows()
        val tV = b.column(txtIdx)
        val anyNull = tV.hasNull
        var i = 0
        while (i < n) {
          if (!(anyNull && tV.isNullAt(i))) {
            val s = tV.getUTF8String(i)
            val bytes = s.getBytes
            var start = 0
            var p = 0
            while (p <= bytes.length) {
              if (p == bytes.length || bytes(p) == ' ') {
                if (p > start) { // the =!= "" filter
                  val tok = UTF8String.fromBytes(bytes, start, p - start)
                  var c = counts.get(tok)
                  if (c == null) { c = new Array[Long](1); counts.put(tok.clone(), c) }
                  c(0) += 1L
                }
                start = p + 1
              }
              p += 1
            }
          }
          i += 1
        }
      }
      val out = Vector.newBuilder[(String, Long)]
      counts.forEach((k, v) => out += ((k.toString, v(0))))
      out.result().iterator
    }
    val top: Seq[Row] = if (driverFinaleOk) {
      val merged = new java.util.HashMap[String, Array[Long]]()
      partials.collect().foreach { case (tok, c) =>
        merged.computeIfAbsent(tok, _ => new Array[Long](1))(0) += c
      }
      val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      merged.forEach((k, v) => all += ((k, v(0))))
      all.sortWith { case ((ta, ca), (tb, cb)) =>
        if (ca != cb) ca > cb
        else UTF8String.fromString(ta).compareTo(UTF8String.fromString(tb)) < 0
      }.take(20).map { case (t, c) => Row(t, c) }.toSeq
    } else {
      // distributed finale: exact global counts via one vocab-sized
      // shuffle, then a lossless per-partition top-20 merge — the driver
      // sees exactly 20 rows (count DESC, token binary ASC, as the output)
      val ord = new Ordering[(String, Long)] with Serializable {
        def compare(x: (String, Long), y: (String, Long)): Int =
          if (x._2 != y._2) java.lang.Long.compare(y._2, x._2)
          else UTF8String.fromString(x._1).compareTo(UTF8String.fromString(y._1))
      }
      partials.reduceByKey(_ + _).takeOrdered(20)(ord)
        .map { case (t, c) => Row(t, c) }.toSeq
    }
    val outSchema = StructType(Seq(
      StructField("tok", StringType, nullable = true),
      StructField("c", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(top.asJava, outSchema)
  }

  /** Q20 per-label embedding stats: dim + mean L2 norm.
    * Norms are per-row JVM folds (bit-identical across engines); the MEAN
    * goes through a 1e-8 fixed-point long sum so the only remaining
    * order-dependent double aggregate in the contract is eliminated —
    * results are exact at any partitioning.
    */
  def q20(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .groupBy("label")
      .agg(
        count(lit(1)).as("c"),
        round(avg(size(col("embedding"))), 1).as("dim"),
        round(sum(round(TextVecExprs.floatVecNorm(col("embedding")) * 1e8).cast("long"))
          .cast("double") / 1e8 / count(lit(1)), 4).as("avg_l2"))
      .orderBy("label")
}
