package graft

import graft.expressions.TextVecExprs
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-based properties (SURVEY §5.2 items 3–4): the custom
  * expressions must agree with the independent HOF formulations on
  * arbitrary inputs, and the fixed-point sum must be exact.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling from a Gen (no scalatestplus bridge offline). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.Row

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.alphaUpperChar)))
        .map(_.mkString))

  test("ShingleJaccard == HOF array_intersect/union Jaccard on random text") {
    import spark.implicits._
    val ps = samples(Gen.zip(asciiText, asciiText), 150)
    val df = ps.toDF("a", "b")
    val rows = df.select(
      TextVecExprs.shingleJaccard(col("a"), col("b"), 8).as("fast"),
      try_divide(
        size(array_intersect(TextFunctions.shingles(col("a"), 8),
          TextFunctions.shingles(col("b"), 8))).cast("double"),
        size(array_union(TextFunctions.shingles(col("a"), 8),
          TextFunctions.shingles(col("b"), 8))).cast("double")).as("ref"))
      .collect()
    rows.foreach { r: Row =>
      val fast = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val ref = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(fast == ref, s"fast=$fast ref=$ref")
    }
  }

  test("jaccard is symmetric and in [0,1]") {
    import spark.implicits._
    val ps = samples(Gen.zip(asciiText, asciiText), 150)
    ps.toDF("a", "b").select(
      TextVecExprs.shingleJaccard(col("a"), col("b"), 8).as("ab"),
      TextVecExprs.shingleJaccard(col("b"), col("a"), 8).as("ba"))
      .collect().foreach { r =>
        if (!r.isNullAt(0)) {
          assert(r.getDouble(0) == r.getDouble(1))
          assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
        }
      }
  }

  test("shingleHashSetUtf8 (rolling byte path) == shingleHashSet (char path) on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    // mixed-case ascii exercises the inline lowercase + rolling hash; the
    // non-ascii variant (é/Д injected) must take the char-path fallback and
    // still agree by construction
    val nonAscii = asciiText.map(s => s + "é Дtail")
    for (k <- Seq(3, 8, 40); g <- Seq(asciiText, nonAscii)) {
      samples(g, 120).foreach { s =>
        val fast = TextVecExprs.shingleHashSetUtf8(UTF8String.fromString(s), k).toSeq
        val ref = TextVecExprs.shingleHashSet(s, k).toSeq
        assert(fast == ref, s"k=$k text='$s'")
      }
    }
  }

  test("TokenStats byte kernel == HashMap reference on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    val ts = graft.expressions.TokenStats(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val withRepeats = asciiText.flatMap(a => asciiText.map(b => s"$a $b $a  $a"))
    samples(Gen.oneOf(asciiText, withRepeats), 250).foreach { s =>
      val r = ts.stats(UTF8String.fromString(s))
      val (tot, dis, top) = ts.statsRef(UTF8String.fromString(s))
      assert(r.getLong(0) == tot && r.getLong(1) == dis && r.getLong(2) == top,
        s"text='$s' got=(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}) want=($tot,$dis,$top)")
    }
  }

  test("fsum is exact vs BigDecimal reference on random 2dp values") {
    import spark.implicits._
    val cents = Gen.chooseNum(-99999L, 999999L).map(_ / 100.0)
    (0 until 5).foreach { trial =>
      val vs = samples(cents, 200 + trial).toList
      val got = vs.toDF("v")
        .repartition(7) // arbitrary partitioning must not matter
        .agg(graft.queries.Relational.dsum(col("v"), 2)).head().getDouble(0)
      val expect = vs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == expect, s"got $got expect $expect")
    }
  }

  test("ivfProbes: distinct in-range indices, nearest-first by dot product") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(8)(Array.fill(16)(rnd.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val vecs = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val got = vecs.toDF("v")
      .select(PipelineExprs.ivfProbes(col("v"), cents, 3).as("p"))
      .collect().map(_.getSeq[Int](0))
    got.zip(vecs).foreach { case (probes, v) =>
      assert(probes.length == 3 && probes.distinct.length == 3)
      assert(probes.forall(i => i >= 0 && i < 8))
      val dots = cents.map(c => c.zip(v).map { case (a, b) => a * b.toDouble }.sum)
      // nearest-first: the reported order must be the true dot-product order
      val expected = dots.zipWithIndex.sortBy { case (d, i) => (-d, i) }
        .take(3).map(_._2).toSeq
      assert(probes == expected, s"probes $probes != $expected")
    }
  }

  test("PqEncode/PqAdcScore == scalar reference on random vectors and codebooks") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val rnd = new scala.util.Random(11)
    val m = 4; val ksub = 8; val dsub = 4; val d = m * dsub
    val cb = Array.fill(m, ksub, dsub)(rnd.nextGaussian())
    val vecs = Seq.fill(60)(Array.fill(d)(rnd.nextGaussian().toFloat))
    val qv = Array.fill(d)(rnd.nextGaussian().toFloat)
    val rows = vecs.toDF("v")
      .select(PipelineExprs.pqEncode(col("v"), cb).as("c"), col("v"))
      .select(col("c"),
        PipelineExprs.pqAdcScore(col("c"), typedLit(qv.toSeq), cb).as("s"))
      .collect().map(r => (r.getSeq[Int](0), r.getDouble(1)))
    rows.zip(vecs).foreach { case ((codes, score), v) =>
      // reference encode: per-subspace L2 argmin, ties to the lower index
      val refCodes = (0 until m).map { s =>
        val sub = v.slice(s * dsub, (s + 1) * dsub).map(_.toDouble)
        (0 until ksub).minBy(c =>
          (sub.zip(cb(s)(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c))
      }
      assert(codes == refCodes, s"codes $codes != $refCodes")
      // reference score: dot(q, reconstruction) / ||reconstruction||
      val recon = refCodes.zipWithIndex.flatMap { case (c, s) => cb(s)(c) }.toArray
      val dot = qv.map(_.toDouble).zip(recon).map { case (a, b) => a * b }.sum
      val nrm = math.sqrt(recon.map(x => x * x).sum)
      val ref = dot / nrm
      assert(math.abs(score - ref) < 1e-9, s"score $score != $ref")
    }
  }

  test("bandKeysFromSig rejects signatures not divisible by bands") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("sig")
        .select(TextVecExprs.bandKeysFromSig(col("sig"), 2)).collect()
    }
    assert(err.getMessage.contains("multiple of bands") ||
      err.getCause != null && err.getCause.getMessage.contains("multiple of bands"))
  }

  test("zValue == reference bit-interleave on random 16-bit bucket pairs") {
    import spark.implicits._
    // reference Morton interleave: bit i of a -> bit 2i, bit i of b -> 2i+1
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
      }
    val ps = samples(Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)), 300) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val rows = ps.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.operators.Layout.zValue(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == ref(a, b), s"zValue($a, $b) = $z != ${ref(a, b)}")
    }
  }

  test("zValueN == reference N-dim interleave; degenerates to zValue at N=2") {
    import spark.implicits._
    // reference: bit b of dim i -> bit b*n + i
    def refN(xs: Seq[Long], bits: Int): Long = {
      val n = xs.size
      xs.zipWithIndex.foldLeft(0L) { case (z, (x, i)) =>
        (0 until bits).foldLeft(z)((acc, b) => acc | ((x >> b & 1L) << (b * n + i)))
      }
    }
    val bits3 = graft.operators.Layout.bitsPerDim(3)
    assert(bits3 === 16)
    assert(graft.operators.Layout.bitsPerDim(4) === 15)
    val ps = samples(Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L),
      Gen.chooseNum(0L, 65535L)), 200) ++
      Seq((0L, 0L, 0L), (65535L, 65535L, 65535L), (0L, 65535L, 1234L))
    val rows = ps.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.operators.Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits3).as("z3"),
        graft.operators.Layout.zValueN(Seq(col("a"), col("b")), 16).as("z2"),
        graft.operators.Layout.zValue(col("a"), col("b")).as("zl"))
      .collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == refN(Seq(a, b, c), bits3), s"zValueN($a,$b,$c)")
      assert(r.getLong(4) == r.getLong(5),
        s"zValueN at N=2 must equal the magic-ladder zValue for ($a,$b)")
    }
  }

  test("Misra-Gries bounds hold on arbitrary random streams (property)") {
    // heavy skew, mild skew, uniform — across ks; the superset guarantee
    // and the n/(k+1) underestimate bound must hold for every stream
    val streamGen: Gen[List[String]] = for {
      n <- Gen.chooseNum(200, 2000)
      zipf <- Gen.chooseNum(1, 3)
      items <- Gen.listOfN(n, Gen.chooseNum(1, 200).map(i =>
        "it" + math.min(200, math.pow(i, zipf).toLong / math.pow(200, zipf - 1).toLong)))
    } yield items
    samples(Gen.zip(streamGen, Gen.chooseNum(5, 40)), 25).foreach { case (data, k) =>
      val agg = new graft.functions.MisraGries(k)
      // simulate distributed partial aggregation: 4 partitions, merged
      val states = data.grouped(math.max(1, data.size / 4)).map(part =>
        part.foldLeft(agg.zero)(agg.reduce)).toSeq
      val sketch = agg.finish(states.reduce(agg.merge))
      assert(sketch.size <= k)
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = data.size.toLong / (k + 1)
      val mustHave = exact.filter(_._2 > bound).keySet
      assert(mustHave.subsetOf(sketch.keySet),
        s"k=$k n=${data.size}: missing ${mustHave -- sketch.keySet}")
      sketch.foreach { case (item, est) =>
        val truth = exact(item)
        assert(est <= truth && truth - est <= bound,
          s"k=$k: $item est=$est truth=$truth bound=$bound")
      }
    }
  }

  test("WordBigrams == HOF zip_with/slice bigrams on random spacey text") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val spacey: Gen[String] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaLowerChar), (3, Gen.const(' ')), (1, Gen.numChar)))
        .map(_.mkString))
    val edge = Seq("", " ", "  ", "a", " a ", "a b", "a  b", "  a  b  c ",
      "héllo wörld ünïcode tëxt", "日本 語 テスト")
    val texts = samples(spacey, 200) ++ edge
    texts.toDF("t")
      .select(PipelineExprs.wordBigrams(col("t")).as("fast"),
        graft.queries.Pipeline.bigramsHof(col("t")).as("ref"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
      }
  }

  test("WordTrigrams == HOF trigram sets on random spacey text") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val spacey: Gen[String] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaLowerChar), (3, Gen.const(' ')), (1, Gen.numChar)))
        .map(_.mkString))
    val edge = Seq("", " ", "a b", "a b c", "a  b   c", " a b c d ",
      "x x x x", "héllo wörld ünïcode tëxt quatre")
    val texts = samples(spacey, 200) ++ edge
    texts.toDF("t")
      .select(PipelineExprs.wordTrigrams(col("t")).as("fast"),
        graft.queries.Pipeline.trigramSetHof(col("t")).as("ref"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
      }
  }

  test("WinnowFingerprints == direct recompute on random ascii text (property)") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    def brute(s: String, k: Int, w: Int): Seq[Long] = {
      val p = s.length - k + 1
      if (p <= 0) Seq.empty
      else {
        val h = (0 until p).map { i =>
          s.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
        }
        (0 until math.max(p - w + 1, 1))
          .map(j => h.slice(j, math.min(j + w, p)).min).distinct.sorted
      }
    }
    // lengths straddling every branch: < k, == k, in (k, k+w-1), >= k+w
    val gen: Gen[String] = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.numChar)))
        .map(_.mkString))
    val texts = samples(gen, 250)
    texts.toDF("t")
      .select(col("t"), PipelineExprs.winnowFingerprints(col("t"), 8, 4).as("fp"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](1) == brute(r.getString(0), 8, 4),
          s"mismatch on '${r.getString(0)}'")
      }
  }

  test("WordTrigramHashes == sorted distinct mix64 of WordTrigrams strings") {
    import spark.implicits._
    import graft.expressions.{PipelineExprs, TextVecExprs}
    def refHash(s: String): Long = {
      var h = 1125899906842597L
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach(b => h = h * 31 + b)
      TextVecExprs.mix64(h)
    }
    val gen: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaLowerChar), (3, Gen.const(' ')), (1, Gen.const('é'))))
        .map(_.mkString))
    val rows = samples(gen, 200).toDF("t").select(
      PipelineExprs.wordTrigramHashes(col("t")).as("fast"),
      PipelineExprs.wordTrigrams(col("t")).as("ref"), col("t")).collect()
    rows.foreach { r =>
      val fast = r.getSeq[Long](0)
      val ref = r.getSeq[String](1).map(refHash).distinct.sorted
      assert(fast == ref, s"mismatch on '${r.getString(2)}'")
    }
  }

  test("JsonScalarProbe == get_json_object on generated JSON objects") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    // JSON text generator: top-level objects with unique keys, scalar and
    // nested values, random whitespace — the probe must agree with
    // get_json_object on every scalar case (strings incl. escapes/quotes/
    // unicode/surrogate pairs, ints, canonical doubles, booleans, null,
    // missing key) and return NULL for nested values (declared divergence,
    // asserted separately).
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val strChunk: Gen[String] = Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)), (1, Gen.const("\"")),
      (1, Gen.const("\\")), (1, Gen.const("é")), (1, Gen.const("€")),
      (1, Gen.const(new String(Character.toChars(0x1F600)))),
      (1, Gen.const("\n")), (1, Gen.const(" ")))
    val scalarVal: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-1000000, 1000000).map(_.toString),
      Gen.chooseNum(-1000.0, 1000.0).map(d => (math.rint(d * 100) / 100).toString),
      Gen.oneOf("true", "false", "null"),
      Gen.oneOf(
        Gen.const("\"\""),
        Gen.listOfN(6, strChunk).map(cs => "\"" + esc(cs.mkString) + "\"")))
    val nestedVal: Gen[String] = Gen.oneOf(
      "{\"in\":\"nested \\\" str\",\"m\":[1,{\"d\":2}]}", "[1,2,\"x]\"]", "{}", "[]")
    val ws: Gen[String] = Gen.oneOf("", " ", "  ", "\n", "\t")
    val docGen: Gen[String] = for {
      keys <- Gen.someOf(Seq("k", "aa", "bb", "cc", "dd"))
      shuffled <- Gen.const(keys)
      vals <- Gen.listOfN(keys.size, Gen.frequency((6, scalarVal), (1, nestedVal)))
      w1 <- ws; w2 <- ws; w3 <- ws; w4 <- ws
    } yield shuffled.zip(vals)
      .map { case (k, v) => s"""$w1"$k"$w2:$w3$v""" }.mkString("{", ",", s"}$w4")
    val docs = samples(docGen, 300) ++ Seq(
      "", "   ", "not json", "{", "{\"k\"", "{\"k\":}", "{\"k\":5",
      "{\"k\":5}", "{\"k\" : -12.5 }", "{\"k\":\"\\u0041\\ud83d\\ude00\"}",
      "{\"other\":1}", "null", "[1,2]", "{\"k\":1e3}",
      // strict-number parity (Jackson rejects malformed, renders -0 as 0)
      "{\"k\":05}", "{\"a\":05,\"k\":1}", "{\"k\":1.}", "{\"k\":1e}",
      "{\"k\":-0}", "{\"k\":+5}", "{\"k\":- 5}", "{\"k\":-5e-3}",
      "{\"k\":1e+2}", "{\"k\":1,\"k\":2}", "{\"a\":{\"k\":9},\"k\":7}",
      "{ \"k\":5}garbage", "{\"k\":5,}",
      "{\"k\":123456789012345678901234567890}", "{\"k\":-0.0}",
      // structural faults INSIDE skipped values (streaming parser rejects;
      // a depth-counting skip would not): mismatched bracket types,
      // missing commas/colons, trailing/double commas, unquoted keys
      "{\"a\":[1},\"k\":5}", "{\"a\":{\"x\":1]},\"k\":5}",
      "{\"a\":[1 2],\"k\":5}", "{\"a\":{\"x\":1 \"y\":2},\"k\":5}",
      "{\"a\":{\"x\" 1},\"k\":5}", "{\"a\":[1,],\"k\":5}",
      "{\"a\":1,,\"k\":5}", "{a:1,\"k\":5}", "{\"k\":NaN}",
      // Hive-compat leniency the shared Jackson factory enables
      "{'k':5}", "{\"k\":'v'}", "{'k':'a\\'b'}", "{\"k\":\"a\\'b\"}",
      "{\"k\":\"a\nb\"}", "{'k':'a\"b'}",
      // valid skipped composites
      "{\"a\":[],\"k\":5}", "{\"a\":{},\"k\":5}", "{\"a\":[[[[1]]]],\"k\":5}")
    val rows = docs.toDF("j").select(
      PipelineExprs.jsonScalarProbe(col("j"), "k").as("fast"),
      get_json_object(col("j"), "$.k").as("ref"),
      col("j")).collect()
    rows.foreach { r =>
      val fast = Option(r.getString(0))
      val ref = Option(r.getString(1))
      // declared divergence: nested values -> probe NULL while
      // get_json_object re-serializes the subtree
      val nested = ref.exists(v => v.startsWith("{") || v.startsWith("["))
      if (nested) assert(fast.isEmpty, s"nested should be NULL: ${r.getString(2)}")
      else assert(fast == ref, s"fast=$fast ref=$ref on ${r.getString(2)}")
    }
  }

  test("JsonIntProbe == cast(JsonScalarProbe AS INT) incl. boundary/float/string values") {
    import spark.implicits._
    import graft.expressions.PipelineExprs
    // the fused probe must equal the unfused probe + non-ANSI cast on EVERY
    // document: canonical ints (fast path) across the int boundary, floats
    // (Double re-render then truncating toInt), numeric strings (cast
    // parses), non-numeric strings/booleans (cast -> NULL), JSON null,
    // missing keys, nested and malformed docs (probe -> NULL)
    val intGen: Gen[String] = Gen.oneOf(
      Gen.chooseNum(Int.MinValue.toLong - 10, Int.MinValue.toLong + 10),
      Gen.chooseNum(Int.MaxValue.toLong - 10, Int.MaxValue.toLong + 10),
      Gen.chooseNum(-1000000L, 1000000L),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.toString)
    val valGen: Gen[String] = Gen.frequency(
      (4, intGen),
      (2, Gen.chooseNum(-1e9, 1e9).map(d => (math.rint(d * 100) / 100).toString)),
      (1, Gen.oneOf("true", "false", "null", "1e3", "-5e-3", "0.0", "-0")),
      (1, intGen.map(v => "\"" + v + "\"")),
      (1, Gen.oneOf("\"x\"", "\" 7 \"", "\"4.5\"", "\"\"", "[1,2]", "{\"n\":1}")))
    val docGen: Gen[String] = Gen.frequency(
      (8, valGen.map(v => s"""{"k":$v}""")),
      (1, valGen.map(v => s"""{"a":$v}""")),
      (1, Gen.oneOf("{", "not json", "", "{\"k\":05}", "{\"k\":1.}")))
    val docs = samples(docGen, 400) ++ Seq(
      "{\"k\":2147483647}", "{\"k\":-2147483648}", "{\"k\":2147483648}",
      "{\"k\":-2147483649}", "{\"k\":123456789012345678901234567890}",
      "{\"k\":-123456789012345678901234567890}", "{\"k\":9223372036854775807}",
      "{\"k\":-9223372036854775808}", "{\"k\":18446744073709551617}",
      "{\"k\":-0}", "{\"k\":0}", "{'k':42}")
    // the fused probe's declared cast semantics are NON-ANSI (never throws,
    // NULL on overflow, floats truncate) — compare under that mode; under
    // ANSI (Spark 4 default) the unfused cast would THROW on '-1.0'
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val rows = try docs.toDF("j").select(
      PipelineExprs.jsonIntProbe(col("j"), "k").as("fused"),
      PipelineExprs.jsonScalarProbe(col("j"), "k").cast("int").as("ref"),
      col("j")).collect()
    finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    rows.foreach { r =>
      val fused = if (r.isNullAt(0)) None else Some(r.getInt(0))
      val ref = if (r.isNullAt(1)) None else Some(r.getInt(1))
      assert(fused == ref, s"fused=$fused ref=$ref on ${r.getString(2)}")
    }
  }

  test("two JsonIntProbes over a NON-nullable input share one codegen scope") {
    // with a non-nullable child, nullSafeCodeGen emits the result code
    // unbraced — a fixed-name local would be declared twice and janino
    // would reject the generated method; codegen.fallback=false turns the
    // silent interpreted fallback into a test failure
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq(7L).toDF("id").select(
        PipelineExprs.jsonIntProbe(
          concat(lit("{\"a\":"), col("id").cast("string"), lit(",\"b\":2}")), "a").as("a"),
        PipelineExprs.jsonIntProbe(
          concat(lit("{\"a\":"), col("id").cast("string"), lit(",\"b\":2}")), "b").as("b")).head()
      assert(r.getInt(0) == 7 && r.getInt(1) == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", saved)
  }

  test("JsonIntProbe adversarial structural docs == try_cast(get_json_object AS INT)") {
    // r11 verdict item 5: the fused probe is new, hot (q10), and non-ANSI
    // by design — pin it against Spark's OWN parser + try_cast on the
    // structurally adversarial shapes a byte scanner can get wrong:
    // boundary ints, leading zeros, escaped quotes BEFORE the key (the
    // scanner must not match a "k" inside a string value), key-as-prefix
    // (kk vs k, both orders), duplicate keys, non-ASCII bytes in values
    // and keys (multi-byte UTF-8 must not desync the scan), nested objects
    // containing the key before the real top-level key, and escape
    // sequences inside candidate keys. try_cast never throws, so the
    // reference side runs under the session's default ANSI mode.
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val docs = Seq(
      """{"k":2147483647}""", """{"k":-2147483648}""",
      """{"k":2147483648}""", """{"k":-2147483649}""",
      """{"k":007}""", """{"k":-007}""", """{"k":00}""", """{"k":0123456789}""",
      """{"a":"\"k\":9","k":5}""", """{"a":"{\"k\":9}","k":6}""",
      """{"a":"\\","k":12}""", """{"a":"\\\"k\":13,","k":14}""",
      """{"\"k":1,"k":7}""", """{"k\"":1,"k":15}""",
      """{"kk":1,"k":2}""", """{"k":3,"kk":1}""", """{"k2":1,"k":4}""",
      """{"kk":1}""", """{"ak":1}""", """{"ka":1}""",
      """{"k":1,"k":2}""", """{"k":"x","k":9}""",
      """{"a":"héllo wörld","k":3}""", """{"é":9,"k":8}""",
      """{"a":"é😀","k":11}""", """{"日本":1,"k":16}""",
      """{"b":{"k":9},"k":10}""", """{"b":[{"k":9},"k"],"k":17}""",
      """{"k":"42"}""", """{"k":" 42 "}""", """{"k":null}""", """{"k":[7]}""",
      """{ "k" : 21 }""", """{"a":1,"k":22,"z":3}""")
    val rows = docs.toDF("j").select(
      PipelineExprs.jsonIntProbe(col("j"), "k").as("fused"),
      expr("try_cast(get_json_object(j, '$.k') AS INT)").as("ref"),
      col("j")).collect()
    rows.foreach { r =>
      val fused = if (r.isNullAt(0)) None else Some(r.getInt(0))
      val ref = if (r.isNullAt(1)) None else Some(r.getInt(1))
      assert(fused == ref, s"fused=$fused ref=$ref on ${r.getString(2)}")
    }
  }

  test("Json probes reject non-string input at ANALYSIS time") {
    // r11 advice: without an input-type check, SQL misuse on a non-string
    // column failed at RUNTIME (janino error on .getBytes, then an
    // interpreted ClassCastException) instead of a readable analysis error
    import spark.implicits._
    import graft.expressions.PipelineExprs
    val df = Seq(1L).toDF("x")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(PipelineExprs.jsonIntProbe(col("x"), "k")).collect()
    }
    assert(e1.getMessage.contains("STRING"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(PipelineExprs.jsonScalarProbe(col("x"), "k")).collect()
    }
    assert(e2.getMessage.contains("STRING"), e2.getMessage)
    graft.functions.GraftSqlFunctions.register(spark)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_json_int(1, 'k')").collect()
    }
    assert(e3.getMessage.contains("STRING"), e3.getMessage)
  }

  test("minhash signature positions estimate Jaccard within statistical bounds") {
    import spark.implicits._
    // near-identical strings must have high signature agreement; disjoint low
    val base = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val near = base.replace("dog", "cat")
    val far = "completely different content with no overlap whatsoever here"
    val df = Seq((base, near), (base, far)).toDF("a", "b")
      .select(TextVecExprs.sigMatchCount(
        TextVecExprs.minHashSig(col("a"), 8, 16),
        TextVecExprs.minHashSig(col("b"), 8, 16)).as("m"))
    val Seq(mNear, mFar) = df.collect().map(_.getInt(0)).toSeq
    assert(mNear >= 8, s"near-dup signature agreement too low: $mNear/16")
    assert(mFar <= 4, s"disjoint signature agreement too high: $mFar/16")
  }

  test("mergePair fold == two-pointer greedy merge on random symbol arrays") {
    import spark.implicits._
    // tiny alphabet + multi-char symbols force frequent (including
    // adjacent-overlap) matches; pairs drawn from the same alphabet so
    // a == b and merged-value collisions actually occur
    val sym = Gen.oneOf("a", "b", "ab", "ba", "aa")
    val arr = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, sym))
    val cases = samples(Gen.zip(arr, sym, sym), 120)
    def refMerge(syms: List[String], a: String, b: String): List[String] = {
      val acc = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          acc += (a + b); i += 2
        } else { acc += syms(i); i += 1 }
      }
      acc.toList
    }
    val df = cases.map { case (s, a, b) => (s, a, b) }.toDF("syms", "a", "b")
    // one plan per distinct pair (the pair is a literal in the expression)
    for (((a, b), group) <- cases.groupBy { case (_, a, b) => (a, b) }) {
      val got = group.map(_._1).toDF("syms")
        .select(graft.queries.Pipeline.mergePair(col("syms"), a, b).as("m"))
        .collect().map(_.getSeq[String](0).toList)
      val want = group.map { case (s, _, _) => refMerge(s, a, b) }
      assert(got.toSeq === want.toSeq, s"mergePair diverges for pair ($a,$b)")
    }
    assert(df.count() === cases.length.toLong)
  }
}
