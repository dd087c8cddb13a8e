package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM expressions for the training-data pipeline operators
  * (document fingerprinting, SimHash, SRP bucketing). Deterministic and
  * stateless; see TextVecExprs for why these beat HOF formulations.
  */
object PipelineExprs {
  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Polynomial rolling-hash fingerprint over the text's chars, mod 1e9+7.
    * Matches the DuckDB fold
    * list_reduce(list_prepend(0, [ascii(c) for c in string_split(t,'')]),
    *             (a,b) -> (a*31+b) % 1000000007)
    * for ASCII text (verified: the whole documents corpus is ASCII at every
    * SF). On non-ASCII input the engines diverge — DuckDB's '' split works
    * on bytes while this works on UTF-16 code units — so the fingerprint is
    * still deterministic but not oracle-comparable there.
    */
  def polyFingerprint(text: Column): Column = col(PolyFingerprint(expr(text)))

  /** 64-bit SimHash over lowercased whitespace tokens: for each bit, count
    * tokens whose (mixed) hash has the bit set; the bit is set in the result
    * iff count*2 > totalTokens. One pass; no oracle (hash family is ours).
    */
  def simHash64(text: Column): Column = col(SimHash64(expr(text)))

  /** Sign-random-projection bucket id over a float vector: bit p of the
    * result is sign(dot(v, h_p)) where h_p is a deterministic pseudo-random
    * hyperplane derived from splitmix64(p, i). Nearby vectors (cosine)
    * collide with high probability — the coarse index for ANN search.
    */
  def srpBucket(vec: Column, planes: Int): Column = col(SrpBucket(expr(vec), planes))

  /** Adjacent word-bigram strings ("tokₖ tokₖ₊₁") over the non-empty
    * single-space-separated tokens of the text — the single-pass form of
    * zip_with(slice(toks,1,n-1), slice(toks,2,n-1), concat), which costs
    * six CodegenFallback HOF passes plus a per-element lambda eval. One
    * byte-level scan; safe because 0x20 never occurs inside a UTF-8
    * multi-byte sequence.
    */
  def wordBigrams(text: Column): Column = col(WordBigrams(expr(text)))

  /** IVF coarse-quantizer probe list: the `nprobe` centroid indices nearest
    * to the vector by cosine (centroids are unit-normalized, so ranking by
    * raw dot product is cosine ranking), nearest first, ties by lower
    * index. `nprobe = 1` is the assignment; larger values are the query-side
    * probe schedule. Centroids ride inside the expression (k×d doubles —
    * literal-sized), so evaluation is a single JVM pass with no join.
    */
  def ivfProbes(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    col(IvfProbes(expr(vec), centroids, nprobe))

  /** Product-quantization encoder: split the d-dim float vector into
    * `codebook.length` contiguous subspaces and emit, per subspace, the
    * index of the L2-nearest sub-centroid — the m-byte compressed code that
    * replaces the d·4-byte embedding in an ADC scan (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"). Ties go to the
    * lower index; codebooks ride inside the expression (m×ksub×dsub
    * doubles — literal-sized), so encoding is one JVM pass with no join.
    */
  def pqEncode(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    col(PqEncode(expr(vec), codebook))

  /** Asymmetric-distance score for a PQ code against a RAW query vector:
    * dot(q, x̂)/‖x̂‖ where x̂ is the code's reconstruction (concatenated
    * sub-centroids) — i.e. cosine(q, x̂)·‖q‖; divide by the query norm
    * outside to get approximate cosine. The query side stays exact (that
    * is the "asymmetric" in ADC — only the database side is quantized), so
    * the only error is the candidate's quantization error. Per row: m·dsub
    * = d multiplies against the code's sub-centroids, on 8-byte codes that
    * fit cache — the memory-bandwidth shape that makes PQ scans fast.
    */
  def pqAdcScore(codes: Column, qv: Column, codebook: Array[Array[Array[Double]]]): Column =
    col(PqAdcScore(expr(codes), expr(qv), codebook))

  /** BPE encoder: apply a learned merge table (rank-ordered (left, right)
    * pairs — q142's training artifact) to the text's whitespace words and
    * emit the concatenated symbol sequence. Exactly the training
    * procedure's own apply step — each merge does the same greedy
    * left-to-right non-overlapping pass [[graft.queries.Pipeline
    * .mergePair]] folds, in rank order — so encoded symbols live in
    * precisely the vocabulary training built. The table rides inside the
    * expression (driver-sized — real tokenizers ship 30–100k merges), so
    * encoding is a row-local single pass: the 100 TB-corpus cost is one
    * map-side projection, no join, no shuffle.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    col(BpeEncode(expr(text), merges.toIndexedSeq))

  /** Per-document token frequency stats in ONE pass: total token count,
    * distinct token count, and the highest single-token frequency — the
    * inputs to Gopher-style repetition filters (top-token fraction,
    * distinct-token ratio). Tokens are the non-empty runs between 0x20
    * bytes, exactly string_split(text,' ') + empty filter. The multi-shuffle
    * alternative (explode → count per (doc,word) → re-agg per doc) pays two
    * extra exchanges for the same numbers.
    */
  def tokenStats(text: Column): Column = col(TokenStats(expr(text)))

  /** DISTINCT adjacent word-trigram strings ("tok₁ tok₂ tok₃") in first-
    * occurrence order — exactly array_distinct(transform(sequence(...),
    * i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) over the non-empty
    * space-split tokens, which costs seven interpreted HOF passes per row
    * (measured ~3 s per pass over 5 000 docs — the q68 bottleneck, since
    * the join pipeline re-derives the sets on each side). One byte-level
    * scan + one hash set.
    */
  def wordTrigrams(text: Column): Column = col(WordTrigrams(expr(text)))

  /** Winnowing (MOSS-style) document fingerprints: the sorted distinct
    * minima of a `w`-wide sliding window over the rolling polynomial hashes
    * of the text's `k`-grams. The guarantee that makes this THE containment
    * fingerprint: any shared substring of length >= k+w-1 contributes at
    * least one identical fingerprint to both documents, while storage is
    * ~1/w of the k-gram count. Hash = fold (h*31 + codepoint) mod 1e9+7
    * over the k codepoints (exactly DuckDB list_reduce over ord(), so the
    * oracle reproduces it — codepoints, not UTF-16 units, because len()/
    * string_split count codepoints); below w positions the clipped window's
    * minimum is kept, so every doc with >= k chars fingerprints. One pass,
    * O(len) via rolling updates; per-char cost is a mul+add+mod.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    col(WinnowFingerprints(expr(text), k, w))

  /** Single-pass top-level JSON scalar probe — `get_json_object(json,
    * '$.key')` specialized to one top-level key with a scalar value, as a
    * byte scan with zero parser allocation (what a native engine's JSON
    * path probe does). Contract, property-tested against get_json_object:
    * identical for values that are strings (unescaped), booleans, or
    * numbers in canonical form, and for JSON null / missing key / invalid
    * JSON (all SQL NULL) — where "invalid" matches the built-in's shared
    * Jackson factory exactly: single-quoted strings and raw control chars
    * are ACCEPTED (Hive compat), while any structural fault anywhere in
    * the document (mismatched bracket types, missing commas/colons,
    * trailing commas, unquoted keys, lax numbers) is rejected even inside
    * values the probe skips. Declared divergence: a key whose value is an
    * object or array returns NULL (get_json_object re-serializes the
    * subtree) — use from_json / parse_json for nested access (q34/q41).
    */
  def jsonScalarProbe(json: Column, key: String): Column =
    col(JsonScalarProbe(expr(json), key))

  /** `cast(jsonScalarProbe(json, key) AS INT)` fused into one codegen'd
    * byte scan — see [[JsonIntProbe]]; the q10 hot path.
    */
  def jsonIntProbe(json: Column, key: String): Column =
    col(JsonIntProbe(expr(json), key))

  /** SORTED distinct 64-bit hashes of the text's adjacent word trigrams —
    * [[wordTrigrams]] with 8-byte set elements instead of strings: the
    * join keys shrink, the shuffle carries longs, and intersection runs as
    * a two-pointer scan ([[sortedLongIntersectCount]]) instead of a per-row
    * hash set over strings. Same 2⁻⁶⁴-collision caveat as q62/q15's hashed
    * shingles (spec-proven count-equal to the string form on the corpus).
    */
  def wordTrigramHashes(text: Column): Column = col(WordTrigramHashes(expr(text)))

  /** |A ∩ B| of two SORTED distinct long-array columns (two-pointer). */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    col(SortedLongIntersectCount(expr(a), expr(b)))

  /** Token boundaries for the space tokenization every word-n-gram
    * expression shares — maximal runs of non-0x20 bytes, exactly
    * string_split(text,' ') with empties dropped (tabs/newlines are NOT
    * separators). Fills starts/ends (callers size them n/2+1, the max
    * token count) and returns the token count. ONE definition so the
    * bigram/trigram/trigram-hash family can never diverge on tokenization.
    */
  private[expressions] def spaceTokenBounds(
      bytes: Array[Byte], starts: Array[Int], ends: Array[Int]): Int = {
    val n = bytes.length
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        starts(nTok) = i
        while (i < n && bytes(i) != ' ') i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    nTok
  }
}

/** See [[PipelineExprs.polyFingerprint]]. */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  protected override def nullSafeEval(input: Any): Any = {
    // iterate Unicode CODEPOINTS, not UTF-16 units: the DuckDB oracle folds
    // ascii(c) over string_split(text,''), which yields one value per
    // codepoint — charAt would hash an astral char as two surrogates
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** See [[PipelineExprs.simHash64]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any = {
    import TextVecExprs.mix64
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](64)
    var total = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var h = 1125899906842597L
        while (i < n && s.charAt(i) != ' ') { h = h * 31 + s.charAt(i); i += 1 }
        val m = mix64(h)
        total += 1
        var b = 0
        while (b < 64) { if (((m >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > total) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** See [[PipelineExprs.srpBucket]]. Hyperplane component h_p[i] is
  * mix64(p*65536 + i) scaled to [-1, 1] — deterministic across executors.
  */
case class SrpBucket(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes > 0 && planes <= 30, "planes must be in (0, 30]")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  protected override def nullSafeEval(input: Any): Any = {
    import TextVecExprs.mix64
    val xs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < xs.length) {
        // mix64 -> [-1, 1): map the top 53 bits to a uniform double
        val u = (mix64(p.toLong * 65536L + i) >>> 11).toDouble / (1L << 53).toDouble
        dot += xs(i).toDouble * (2.0 * u - 1.0)
        i += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** See [[PipelineExprs.wordBigrams]]. Tokenization matches
  * string_split(text, ' ') + empty filter exactly: tokens are maximal runs
  * of non-0x20 bytes (tabs/newlines are NOT separators, as in the oracle).
  */
case class WordBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  protected override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val n = bytes.length
    // token boundaries: starts(t) inclusive, ends(t) exclusive
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    val nTok = PipelineExprs.spaceTokenBounds(bytes, starts, ends)
    val out = new Array[AnyRef](math.max(0, nTok - 1))
    var t = 0
    while (t < nTok - 1) {
      val la = ends(t) - starts(t)
      val lb = ends(t + 1) - starts(t + 1)
      val bg = new Array[Byte](la + 1 + lb)
      System.arraycopy(bytes, starts(t), bg, 0, la)
      bg(la) = ' '
      System.arraycopy(bytes, starts(t + 1), bg, la + 1, lb)
      out(t) = UTF8String.fromBytes(bg)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** See [[PipelineExprs.ivfProbes]]. */
case class IvfProbes(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length,
    "nprobe must be in [1, k]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probes"

  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      IvfProbes.probes(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        centroids, nprobe))

  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}

object IvfProbes {
  /** The row kernel behind [[PipelineExprs.ivfProbes]] — ONE definition
    * shared by the expression's eval and the driver-local Lloyd fold
    * ([[graft.queries.Pipeline]] `ivfTrainLocal`), so the two assignment
    * paths can never diverge.
    */
  def probes(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      centroids: Array[Array[Double]], nprobe: Int): Array[Int] = {
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val n = math.min(xs.numElements(), cen.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += xs.getFloat(i).toDouble * cen(i); i += 1 }
      scores(c) = s
      c += 1
    }
    // selection of the nprobe best by (score desc, index asc) — k is tiny
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && scores(j) > bestScore) { best = j; bestScore = scores(j) }
        j += 1
      }
      if (best == -1) {
        // every remaining score is NaN (corrupt embedding upstream):
        // `NaN > x` is always false, so the scan above selected nothing.
        // Fall back to the first untaken index — deterministic, never crashes;
        // nprobe <= k guarantees an untaken slot exists.
        var j2 = 0
        while (best == -1 && j2 < k) { if (!taken(j2)) best = j2; j2 += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    out
  }
}

/** See [[PipelineExprs.tokenStats]]. Counting uses a per-row HashMap keyed
  * by the token's char content — exact (no hash-collision folding), and the
  * map lives only for the row, so memory is bounded by the row's distinct
  * tokens. struct<n_tok, n_distinct, top_count> output keeps the three
  * numbers in one projection with no repeated tokenization. `doGenCode`
  * calls the row kernel directly on the evaluated child (same measured-
  * glue argument as [[graft.expressions.ShingleHashes]] — PERF.md r10).
  */
case class TokenStats(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  /** Row kernel, public for the generated code: one byte-level scan with an
    * open-addressing (start, len, count) table probed by a 64-bit content
    * hash and CONFIRMED by byte equality — exact for any input (UTF-8 is an
    * injective encoding, so byte equality == string equality; tokenization
    * on the 0x20 byte is exact because it never occurs inside a multi-byte
    * sequence). Replaces the HashMap[String, Int] form — which paid one
    * char-copy of the document plus a String allocation per token — with
    * zero per-token allocation; PropertySpec pins equality against that
    * reference on random text.
    */
  def stats(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = input.getBytes
    val n = b.length
    // distinct tokens ≤ (n+1)/2, so cap ≥ n+2 keeps load ≤ ~0.5. Clamp at
    // 2^30 (the largest power-of-two table): distinct < 2^30 for ANY byte
    // array, so a clamped table still has an empty slot and every probe
    // terminates — without the clamp, `cap <<= 1` overflows past 2^30 and
    // a ≥1 GiB document spins this loop forever (ADVICE r10). Long compare
    // so n + 2 itself can't wrap.
    var cap = 64
    while (cap < (1 << 30) && cap.toLong < n.toLong + 2L) cap <<= 1
    val mask = cap - 1
    val starts = new Array[Int](cap)
    val lens = new Array[Int](cap) // 0 = empty slot (tokens are non-empty)
    val counts = new Array[Int](cap)
    var total = 0L
    var distinct = 0L
    var top = 0L
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) {
        val st = i
        var h = 1125899906842597L
        while (i < n && b(i) != ' ') { h = h * 31 + (b(i) & 0xff); i += 1 }
        val ln = i - st
        total += 1L
        var idx = (graft.expressions.TextVecExprs.mix64(h) & mask).toInt
        var done = false
        while (!done) {
          if (lens(idx) == 0) {
            starts(idx) = st; lens(idx) = ln; counts(idx) = 1
            distinct += 1L
            if (top < 1L) top = 1L
            done = true
          } else if (lens(idx) == ln &&
              java.util.Arrays.equals(b, starts(idx), starts(idx) + ln, b, st, st + ln)) {
            counts(idx) += 1
            if (counts(idx) > top) top = counts(idx).toLong
            done = true
          } else idx = (idx + 1) & mask
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct, top))
  }

  /** The original HashMap[String, Int] formulation — the reference
    * implementation PropertySpec checks [[stats]] against.
    */
  private[graft] def statsRef(input: UTF8String): (Long, Long, Long) = {
    val s = input.toString
    val n = s.length
    val counts = new java.util.HashMap[String, Int]()
    var total = 0L
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && s.charAt(i) != ' ') i += 1
        val tok = s.substring(start, i)
        counts.merge(tok, 1, Integer.sum)
        total += 1L
      }
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; if (c > top) top = c }
    (total, counts.size.toLong, top)
  }

  protected override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("tokenStats", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** See [[PipelineExprs.winnowFingerprints]]. Mirrors the oracle's
  * formulation exactly: 1-indexed k-gram positions i = 1..P (P = number of
  * codepoints - k + 1), h(i) = fold over the k codepoints, window minima
  * min(h(i)..h(min(i+w-1, P))) kept for i <= max(P-w+1, 1) — i.e. full
  * windows, plus one clipped window when the doc has fewer than w k-grams.
  * Rolling hash update: drop the leading char's 31^(k-1) term (mod-safe),
  * shift, add the new char. Window minima via a monotonic index deque —
  * O(P) total, independent of w.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  private val Mod = 1000000007L
  // 31^(k-1) mod p, for the rolling drop-term
  private val powK1: Long = {
    var r = 1L; var i = 0
    while (i < k - 1) { r = r * 31 % Mod; i += 1 }
    r
  }

  protected override def nullSafeEval(input: Any): Any = {
    // positions and hashes are over Unicode CODEPOINTS — DuckDB's len()/
    // string_split(text,'')/ascii() in the q67 oracle count one element
    // per codepoint, so UTF-16 charAt would break parity on astral chars
    val s = input.asInstanceOf[UTF8String].toString
    val cp = s.codePoints().toArray
    val n = cp.length
    val p = n - k + 1
    if (p <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val h = new Array[Long](p)
    var acc = 0L
    var i = 0
    while (i < k) { acc = (acc * 31 + cp(i)) % Mod; i += 1 }
    h(0) = acc
    while (i < n) {
      // remove cp(i-k), append cp(i); +Mod keeps the subtraction non-negative
      acc = ((acc - cp(i - k) * powK1 % Mod + Mod) * 31 + cp(i)) % Mod
      h(i - k + 1) = acc
      i += 1
    }
    val fps = new java.util.TreeSet[Long]()
    if (p <= w) {
      var m = h(0); var j = 1
      while (j < p) { if (h(j) < m) m = h(j); j += 1 }
      fps.add(m)
    } else {
      // monotonic deque of indices with increasing h; front = window min
      val deque = new Array[Int](p)
      var head = 0; var tail = 0 // [head, tail)
      var j = 0
      while (j < p) {
        while (tail > head && h(deque(tail - 1)) >= h(j)) tail -= 1
        deque(tail) = j; tail += 1
        val start = j - w + 1 // window covering positions start..j
        if (start >= 0) {
          if (deque(head) < start) head += 1
          fps.add(h(deque(head)))
        }
        j += 1
      }
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    var t = 0
    while (it.hasNext) { out(t) = it.next(); t += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** See [[PipelineExprs.wordTrigrams]]. Tokenization matches WordBigrams:
  * tokens are maximal runs of non-0x20 bytes (multi-space runs collapse,
  * tabs/newlines are not separators — exactly string_split(text,' ') with
  * empties dropped). Trigrams are rebuilt with single spaces, so they are
  * byte-identical to the oracle's ws[i]||' '||ws[i+1]||' '||ws[i+2].
  */
case class WordTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_trigrams"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    val nTok = PipelineExprs.spaceTokenBounds(bytes, starts, ends)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t < nTok - 2) {
      val la = ends(t) - starts(t)
      val lb = ends(t + 1) - starts(t + 1)
      val lc = ends(t + 2) - starts(t + 2)
      val tg = new Array[Byte](la + 1 + lb + 1 + lc)
      System.arraycopy(bytes, starts(t), tg, 0, la)
      tg(la) = ' '
      System.arraycopy(bytes, starts(t + 1), tg, la + 1, lb)
      tg(la + 1 + lb) = ' '
      System.arraycopy(bytes, starts(t + 2), tg, la + 2 + lb, lc)
      out.add(UTF8String.fromBytes(tg))
      t += 1
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordTrigrams =
    copy(child = newChild)
}

/** See [[PipelineExprs.jsonScalarProbe]]. One byte-level pass over the
  * document: walk the top-level object's key/value pairs, skipping values
  * (strings with escape handling, nested structures by depth count) until
  * the key matches, then materialize the scalar. No tokenizer object, no
  * per-row parser allocation — the probe cost is the bytes actually
  * scanned, which is what lets the per-row JSON cost track the oracle's
  * native parser instead of a general-purpose streaming tokenizer.
  */
case class JsonScalarProbe(child: Expression, key: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  // analysis-time type gate (r11 advice): without it, SQL misuse on a
  // non-string column surfaced as a runtime ClassCastException.
  // (ExpectsInputTypes would say the same thing, but AbstractDataType is
  // private[sql] — a hand-rolled check is the public-API spelling.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def prettyName: String = "json_scalar_probe"

  @transient private lazy val keyBytes: Array[Byte] =
    UTF8String.fromString(key).getBytes

  protected override def nullSafeEval(input: Any): Any =
    JsonScalarProbe.probe(input.asInstanceOf[UTF8String].getBytes, keyBytes)

  override protected def withNewChildInternal(newChild: Expression): JsonScalarProbe =
    copy(child = newChild)
}

object JsonScalarProbe {
  private def skipWs(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i < b.length &&
      (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  private def hex4(b: Array[Byte], i: Int): Int = {
    var v = 0
    var k = 0
    while (k < 4) {
      val c = b(i + k)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      k += 1
    }
    v
  }

  private def writeUtf8(out: java.io.ByteArrayOutputStream, cp: Int): Unit = {
    if (cp < 0x80) out.write(cp)
    else if (cp < 0x800) {
      out.write(0xC0 | (cp >> 6)); out.write(0x80 | (cp & 0x3F))
    } else if (cp < 0x10000) {
      out.write(0xE0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3F))
      out.write(0x80 | (cp & 0x3F))
    } else {
      out.write(0xF0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3F))
      out.write(0x80 | ((cp >> 6) & 0x3F)); out.write(0x80 | (cp & 0x3F))
    }
  }

  /** Parse the JSON string whose opening quote is at `start`; unescaped
    * content goes to `out` when non-null. Returns the index AFTER the
    * closing quote, or -1 if malformed. The quote may be 0x22 or 0x27 —
    * Spark's shared Jackson factory enables ALLOW_SINGLE_QUOTES (Hive
    * compat), and it accepts the \' escape in either quote style; the
    * other quote char is plain content. Raw control bytes pass through
    * (ALLOW_UNESCAPED_CONTROL_CHARS).
    */
  private def parseString(b: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    val n = b.length
    val quote = b(start)
    var i = start + 1
    while (i < n) {
      val c = b(i)
      if (c == quote) return i + 1
      else if (c == '\\') {
        if (i + 1 >= n) return -1
        b(i + 1) match {
          case '"'  => if (out != null) out.write('"');  i += 2
          case '\'' => if (out != null) out.write('\''); i += 2
          case '\\' => if (out != null) out.write('\\'); i += 2
          case '/'  => if (out != null) out.write('/');  i += 2
          case 'b'  => if (out != null) out.write('\b'); i += 2
          case 'f'  => if (out != null) out.write('\f'); i += 2
          case 'n'  => if (out != null) out.write('\n'); i += 2
          case 'r'  => if (out != null) out.write('\r'); i += 2
          case 't'  => if (out != null) out.write('\t'); i += 2
          case 'u' =>
            if (i + 5 >= n) return -1
            var cp = hex4(b, i + 2)
            if (cp < 0) return -1
            i += 6
            if (cp >= 0xD800 && cp <= 0xDBFF && i + 5 < n &&
                b(i) == '\\' && b(i + 1) == 'u') {
              val lo = hex4(b, i + 2)
              if (lo >= 0xDC00 && lo <= 0xDFFF) {
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                i += 6
              }
            }
            if (out != null) writeUtf8(out, cp)
          case _ => return -1
        }
      } else { if (out != null) out.write(c); i += 1 }
    }
    -1
  }

  private def isNumByte(c: Byte): Boolean =
    (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E'

  private def skipValue(b: Array[Byte], start: Int): Int = skipValue(b, start, 0)

  /** Skip one JSON value starting at `start`, FULLY validating its interior
    * — bracket pairing by type, commas, colons, string/number grammar. The
    * streaming parser behind get_json_object tokenizes every nested value,
    * so a lax depth-counting skip would accept documents the built-in
    * rejects (e.g. {"a":[1},"k":5} or a missing comma inside a skipped
    * array) and return a value where it returns NULL. Depth is capped at
    * 1000, Jackson's default StreamReadConstraints nesting limit. Returns
    * the index after the value, or -1 if malformed.
    */
  private def skipValue(b: Array[Byte], start: Int, depth: Int): Int = {
    val n = b.length
    if (start >= n || depth > 1000) return -1
    b(start) match {
      case '"' | '\'' => parseString(b, start, null)
      case '{' =>
        var i = skipWs(b, start + 1)
        if (i < n && b(i) == '}') return i + 1
        while (true) {
          if (i >= n || (b(i) != '"' && b(i) != '\'')) return -1
          i = parseString(b, i, null)
          if (i < 0) return -1
          i = skipWs(b, i)
          if (i >= n || b(i) != ':') return -1
          i = skipValue(b, skipWs(b, i + 1), depth + 1)
          if (i < 0) return -1
          i = skipWs(b, i)
          if (i >= n) return -1
          if (b(i) == ',') i = skipWs(b, i + 1)
          else if (b(i) == '}') return i + 1
          else return -1
        }
        -1
      case '[' =>
        var i = skipWs(b, start + 1)
        if (i < n && b(i) == ']') return i + 1
        while (true) {
          i = skipValue(b, i, depth + 1)
          if (i < 0) return -1
          i = skipWs(b, i)
          if (i >= n) return -1
          if (b(i) == ',') i = skipWs(b, i + 1)
          else if (b(i) == ']') return i + 1
          else return -1
        }
        -1
      case 't' =>
        if (start + 4 <= n && b(start + 1) == 'r' && b(start + 2) == 'u' &&
          b(start + 3) == 'e') start + 4 else -1
      case 'f' =>
        if (start + 5 <= n && b(start + 1) == 'a' && b(start + 2) == 'l' &&
          b(start + 3) == 's' && b(start + 4) == 'e') start + 5 else -1
      case 'n' =>
        if (start + 4 <= n && b(start + 1) == 'u' && b(start + 2) == 'l' &&
          b(start + 3) == 'l') start + 4 else -1
      case c if c == '-' || (c >= '0' && c <= '9') =>
        // strict JSON number grammar — '-'? ('0'|[1-9][0-9]*) frac? exp? —
        // so malformed docs ("05", "1.", "1e") return NULL exactly like
        // the streaming parser behind get_json_object
        var i = start
        if (b(i) == '-') i += 1
        if (i >= n || b(i) < '0' || b(i) > '9') return -1
        if (b(i) == '0') i += 1
        else while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
        if (i < n && b(i) == '.') {
          i += 1
          if (i >= n || b(i) < '0' || b(i) > '9') return -1
          while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
        }
        if (i < n && (b(i) == 'e' || b(i) == 'E')) {
          i += 1
          if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
          if (i >= n || b(i) < '0' || b(i) > '9') return -1
          while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
        }
        i
      case _ => -1
    }
  }

  /** Materialize the scalar value starting at `start`, or null for
    * null/object/array/malformed.
    */
  private def extractScalar(b: Array[Byte], start: Int): UTF8String = {
    val n = b.length
    if (start >= n) return null
    b(start) match {
      case '"' | '\'' =>
        val out = new java.io.ByteArrayOutputStream(32)
        if (parseString(b, start, out) < 0) null
        else UTF8String.fromBytes(out.toByteArray)
      case '{' | '[' => null // declared divergence: nested values -> NULL
      case 't' =>
        if (skipValue(b, start) < 0) null else UTF8String.fromString("true")
      case 'f' =>
        if (skipValue(b, start) < 0) null else UTF8String.fromString("false")
      case 'n' => null // JSON null -> SQL NULL, as get_json_object
      case c if isNumByte(c) =>
        val end = skipValue(b, start)
        if (end < 0) null
        else {
          // integers: raw digits (Jackson writes ints/BigIntegers as-is);
          // floats: get_json_object re-renders via double ("1e3"->"1000.0")
          var float = false
          var k = start
          while (k < end) {
            val x = b(k)
            if (x == '.' || x == 'e' || x == 'E') float = true
            k += 1
          }
          if (!float) {
            // Jackson renders integer values numerically: "-0" -> "0" (the
            // one integer whose raw text differs from its value)
            if (end - start == 2 && b(start) == '-' && b(start + 1) == '0')
              UTF8String.fromString("0")
            else UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, end))
          }
          else try {
            val s = new String(b, start, end - start, java.nio.charset.StandardCharsets.US_ASCII)
            UTF8String.fromString(java.lang.Double.toString(java.lang.Double.parseDouble(s)))
          } catch { case _: NumberFormatException => null }
        }
      case _ => null
    }
  }

  /** Locate the FIRST occurrence of top-level `key` in the JSON object and
    * return its value's start index, with the WHOLE document validated
    * (the scan continues past the match to the object's closing brace —
    * get_json_object, streaming over the whole object, returns NULL on a
    * document whose remainder is malformed, e.g. the truncated `{"k":5`).
    * Returns -1 when the key is absent or the document is not a
    * well-formed JSON object. Shared by the string probe and the fused
    * int probe so their acceptance grammar can never diverge.
    */
  private def probeValueStart(b: Array[Byte], key: Array[Byte]): Int = {
    val n = b.length
    var i = skipWs(b, 0)
    if (i >= n || b(i) != '{') return -1
    i = skipWs(b, i + 1)
    if (i < n && b(i) == '}') return -1 // empty object: key absent
    var result = -1
    while (i < n) {
      val q = b(i)
      if (q != '"' && q != '\'') return -1
      // key fast path: no escapes -> zero-copy compare against keyBytes
      var j = i + 1
      while (j < n && b(j) != q && b(j) != '\\') j += 1
      if (j >= n) return -1
      var matched = false
      if (b(j) == q) {
        val len = j - (i + 1)
        if (len == key.length) {
          matched = true
          var k = 0
          while (matched && k < len) {
            if (b(i + 1 + k) != key(k)) matched = false
            k += 1
          }
        }
        i = j + 1
      } else {
        val out = new java.io.ByteArrayOutputStream(16)
        val end = parseString(b, i, out)
        if (end < 0) return -1
        matched = java.util.Arrays.equals(out.toByteArray, key)
        i = end
      }
      i = skipWs(b, i)
      if (i >= n || b(i) != ':') return -1
      i = skipWs(b, i + 1)
      if (i >= n) return -1
      if (matched && result < 0) result = i
      i = skipValue(b, i)
      if (i < 0) return -1
      i = skipWs(b, i)
      if (i >= n) return -1
      if (b(i) == ',') i = skipWs(b, i + 1)
      else if (b(i) == '}') return result // well-formed object end
      else return -1
    }
    -1
  }

  /** Probe `json` for top-level `key`; null when missing, non-scalar, or
    * the document is not a well-formed JSON object.
    */
  def probe(b: Array[Byte], key: Array[Byte]): UTF8String = {
    val s = probeValueStart(b, key)
    if (s < 0) null else extractScalar(b, s)
  }

  /** Sentinel for "SQL NULL" from [[probeInt]] — safe because every
    * non-null result is int-ranged.
    */
  final val IntNull: Long = Long.MinValue

  /** Fused `cast(probe(json, key) AS INT)` — the q10 hot path. Identical by
    * construction to casting [[probe]]'s result under NON-ANSI cast
    * semantics (never throws; out-of-int-range and non-numeric values →
    * NULL; floats truncate toward zero — under Spark 4's default ANSI
    * mode the unfused cast would instead raise on those, so this probe is
    * the `try_cast`-flavored spelling a data pipeline wants on dirty
    * JSON): canonical integer values (optional '-', digits; the only case
    * where [[extractScalar]]'s rendering is the raw bytes) parse directly
    * with an int-range overflow check — zero allocation; every other
    * value form (floats, strings, booleans, nested, null, missing)
    * delegates to [[extractScalar]] + `UTF8String.toInt`, the exact API
    * Spark's non-ANSI string→int cast calls. Returns [[IntNull]] for SQL
    * NULL. PropertySpec pins equality against the unfused non-ANSI cast
    * on random docs.
    */
  def probeInt(b: Array[Byte], key: Array[Byte]): Long = {
    val start = probeValueStart(b, key)
    if (start < 0) return IntNull
    val c = b(start)
    if (c == '-' || (c >= '0' && c <= '9')) {
      val end = skipValue(b, start)
      if (end < 0) return IntNull // unreachable: probeValueStart validated
      var float = false
      var k = start
      while (k < end) {
        val x = b(k)
        if (x == '.' || x == 'e' || x == 'E') float = true
        k += 1
      }
      if (!float) {
        var i = start
        var neg = false
        if (b(i) == '-') { neg = true; i += 1 }
        var v = 0L
        while (i < end) {
          if (v <= Int.MaxValue.toLong + 1) v = v * 10 + (b(i) - '0')
          i += 1
        }
        val sv = if (neg) -v else v
        if (sv >= Int.MinValue.toLong && sv <= Int.MaxValue.toLong) sv else IntNull
      } else toIntOrNull(extractScalar(b, start))
    } else toIntOrNull(extractScalar(b, start))
  }

  private def toIntOrNull(s: UTF8String): Long = {
    if (s == null) return IntNull
    val w = new UTF8String.IntWrapper
    if (s.toInt(w)) w.value.toLong else IntNull
  }
}

/** Fused JSON int probe: `json_int_probe(doc, key)` ==
  * `cast(json_scalar_probe(doc, key) AS INT)` with the string
  * materialization and per-row cast removed — on the `{"k": <int>}` shape
  * the whole extraction is one validated byte scan plus a direct digit
  * parse, no ByteArrayOutputStream, no UTF8String, no Cast node. Full
  * codegen (the same measured-glue argument as [[TokenStats]]): the
  * generated code calls [[JsonScalarProbe.probeInt]] straight on the
  * child's bytes, so the whole q10 aggregation stays inside one
  * WholeStageCodegen span.
  */
case class JsonIntProbe(child: Expression, key: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // missing key/NULL value on non-null input
  // analysis-time type gate (r11 advice): the generated code calls
  // .getBytes() on the child — a non-string column must fail resolution,
  // not janino compilation
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")
  override def prettyName: String = "json_int_probe"

  @transient private lazy val keyBytes: Array[Byte] =
    UTF8String.fromString(key).getBytes

  protected override def nullSafeEval(input: Any): Any = {
    val r = JsonScalarProbe.probeInt(input.asInstanceOf[UTF8String].getBytes, keyBytes)
    if (r == JsonScalarProbe.IntNull) null else r.toInt
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonIntProbeKey", keyBytes, "byte[]")
    // freshName, NOT a fixed identifier: with a NON-nullable child,
    // nullSafeCodeGen emits the result code unbraced, so two probes in one
    // generated method would otherwise declare the same local twice —
    // a janino compile error and silent fallback to interpreted eval
    val r = ctx.freshName("jsonIntProbeRes")
    nullSafeCodeGen(ctx, ev, a => s"""
      long $r = graft.expressions.JsonScalarProbe.probeInt($a.getBytes(), $keyRef);
      if ($r == ${JsonScalarProbe.IntNull}L) { ${ev.isNull} = true; }
      else { ${ev.value} = (int) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonIntProbe =
    copy(child = newChild)
}

/** See [[PipelineExprs.wordTrigramHashes]]. Same tokenization as
  * [[WordTrigrams]]; each trigram's single-space-joined bytes are hashed
  * (poly-31 seeded 1125899906842597, then splitmix64) WITHOUT materializing
  * the string, and the distinct hashes are returned SORTED ascending — the
  * layout [[SortedLongIntersectCount]]'s two-pointer scan requires.
  */
case class WordTrigramHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_trigram_hashes"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    val nTok = PipelineExprs.spaceTokenBounds(bytes, starts, ends)
    val m = math.max(0, nTok - 2)
    val arr = new Array[Long](m)
    var t = 0
    while (t < m) {
      var h = 1125899906842597L
      var w = 0
      while (w < 3) {
        var p = starts(t + w)
        val e = ends(t + w)
        while (p < e) { h = h * 31 + bytes(p); p += 1 }
        if (w < 2) h = h * 31 + ' '
        w += 1
      }
      arr(t) = TextVecExprs.mix64(h)
      t += 1
    }
    java.util.Arrays.sort(arr)
    var wp = if (m == 0) 0 else 1
    var r = 1
    while (r < m) { if (arr(r) != arr(r - 1)) { arr(wp) = arr(r); wp += 1 }; r += 1 }
    val out = if (wp == m) arr else java.util.Arrays.copyOf(arr, wp)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordTrigramHashes =
    copy(child = newChild)
}

/** See [[PipelineExprs.sortedLongIntersectCount]]: |A ∩ B| of two SORTED
  * distinct long arrays by a two-pointer merge scan — O(|A|+|B|), no
  * per-row hash set (array_intersect builds one per evaluation and
  * compares full strings when elements are strings).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val na = xs.numElements()
    val nb = ys.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

/** See [[PipelineExprs.pqEncode]]. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have >= 1 subspace with >= 1 centroid each")
  private val m = codebook.length
  private val dsub = codebook(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // ||c||^2 per (subspace, centroid), so the per-row argmin compares
  // ||x_s - c||^2 = ||x_s||^2 - 2<x_s,c> + ||c||^2 via -2<x_s,c> + ||c||^2
  // (the ||x_s||^2 term is constant within the argmin and dropped).
  @transient private lazy val cNormSq: Array[Array[Double]] = PqEncode.normsSq(codebook)

  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqEncode.encode(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        codebook, cNormSq, dsub))

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** ||c||^2 per (subspace, centroid) — the precomputed argmin constant the
    * expression caches per instance and the driver-local Lloyd fold
    * recomputes per round (the codebook changes every round there).
    */
  def normsSq(codebook: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebook.map(_.map { c => var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s })

  /** The row kernel behind [[PipelineExprs.pqEncode]] — ONE definition
    * shared by the expression's eval and the driver-local Lloyd fold
    * ([[graft.queries.Pipeline]] `pqTrainLocal`), so the two assignment
    * paths can never diverge. `cNormSq` must be [[normsSq]] of `codebook`.
    */
  def encode(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      codebook: Array[Array[Array[Double]]], cNormSq: Array[Array[Double]],
      dsub: Int): Array[Int] = {
    val m = codebook.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      val norms = cNormSq(s)
      val off = s * dsub
      val lim = math.min(dsub, math.max(0, xs.numElements() - off))
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cen = cents(c)
        var dot = 0.0
        var i = 0
        while (i < lim) { dot += xs.getFloat(off + i).toDouble * cen(i); i += 1 }
        val score = norms(c) - 2.0 * dot
        // strict < keeps the LOWEST index on ties (and on all-NaN rows)
        if (score < bestScore) { best = c; bestScore = score }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }
}

/** See [[PipelineExprs.pqAdcScore]]. left = codes (array<int>), right = the
  * raw query vector (array<float>).
  */
case class PqAdcScore(left: Expression, right: Expression,
    codebook: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {
  private val m = codebook.length
  private val dsub = codebook(0)(0).length

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val cNormSq: Array[Array[Double]] =
    codebook.map(_.map { c => var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s })

  protected override def nullSafeEval(codes: Any, qv: Any): Any = {
    val cs = codes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val q = qv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var dot = 0.0
    var nrm2 = 0.0
    val ns = math.min(m, cs.numElements())
    var s = 0
    while (s < ns) {
      val code = cs.getInt(s)
      val cen = codebook(s)(code)
      nrm2 += cNormSq(s)(code)
      val off = s * dsub
      val lim = math.min(dsub, math.max(0, q.numElements() - off))
      var i = 0
      while (i < lim) { dot += q.getFloat(off + i).toDouble * cen(i); i += 1 }
      s += 1
    }
    if (nrm2 == 0.0) 0.0 else dot / math.sqrt(nrm2)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

/** See [[PipelineExprs.bpeEncode]]. child = the document text; `merges` is
  * the rank-ordered learned merge table. Output: every word's encoded
  * symbols, concatenated in word order (array<string>).
  *
  * Per word the apply step mirrors training byte-for-byte: for each merge
  * (a, b) in rank order, one greedy left-to-right non-overlapping pass
  * replaces adjacent [a, b] with a+b — the imperative twin of the
  * `mergePair` fold (spec-pinned equal on random inputs), iterated over
  * the table. Cost per row: O(merges · len), all row-local.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // Seq field (not Array) so case-class equality compares the merge TABLE,
  // not the array reference — two bpe_encode calls with the same learned
  // table are plan-equal, so Catalyst subexpression/plan dedup can share
  // them (r15 advice). Evaluation indexes flat arrays.
  @transient private lazy val table: Array[(String, String)] = merges.toArray
  @transient private lazy val merged: Array[String] =
    table.map { case (a, b) => a + b }

  protected override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    val words = text.split(' ')
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        // symbols start as single CODE POINTS — the same basis
        // split(text, "") gives training (Java 8+ empty-regex split never
        // splits a surrogate pair), so train/apply agree on supplementary-
        // plane text too; per-UTF-16-unit seeding fragmented astral chars
        // into lone surrogates the learned vocabulary never contains
        var syms = new Array[String](word.codePointCount(0, word.length))
        var i = 0
        var s = 0
        while (i < word.length) {
          val cc = Character.charCount(word.codePointAt(i))
          syms(s) = word.substring(i, i + cc)
          s += 1
          i += cc
        }
        var m = 0
        while (m < table.length && syms.length >= 2) {
          val (a, b) = table(m)
          val ab = merged(m)
          val acc = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              acc += ab; j += 2
            } else { acc += syms(j); j += 1 }
          }
          syms = acc.toArray
          m += 1
        }
        var k = 0
        while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
