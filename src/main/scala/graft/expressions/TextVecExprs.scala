package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text/vector hot paths.
  *
  * The built-in higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback AND pay a per-element lambda-eval cost; profiling at
  * sf0.1 showed 16 minhash `transform` passes over ~300-element shingle
  * arrays dominating q15 (~150 s). These expressions do the same math in
  * one tight JVM pass per row (q15 end-to-end drops to ~2 s). They are
  * deterministic, null-safe, and evaluated per-row with no state — safe at
  * any parallelism.
  */
object TextVecExprs {

  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Spark's codegen'd XxHash64 with an explicit SEED (the public
    * `xxhash64` function pins seed 42): two different seeds give two
    * effectively independent 64-bit fingerprints — a 128-bit-class
    * fingerprint at ~1/10 the per-byte cost of md5 (crypto strength is
    * irrelevant to dedup counting; only collision probability matters,
    * and n²/2¹²⁹ is the same class as md5's).
    */
  def xxhash64Seeded(c: Column, seed: Long): Column =
    col(org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(expr(c)), seed))

  /** LSH band keys of the MinHash signature of character k-gram shingles of
    * lower(text) — one pass, no materialized shingle array.
    */
  def minHashBandKeys(text: Column, k: Int, numHashes: Int, bands: Int): Column =
    col(MinHashBandKeys(expr(text), k, numHashes, bands))

  /** Raw MinHash signature (numHashes longs) of the k-gram shingle set. */
  def minHashSig(text: Column, k: Int, numHashes: Int): Column =
    col(MinHashSig(expr(text), k, numHashes))

  /** Band keys derived from an already-computed signature column. */
  def bandKeysFromSig(sig: Column, bands: Int): Column =
    col(BandKeysFromSig(expr(sig), bands))

  /** Number of equal positions between two equal-length signatures — the
    * cheap estimated-Jaccard prefilter (est J = matches / numHashes).
    */
  def sigMatchCount(a: Column, b: Column): Column =
    col(SigMatchCount(expr(a), expr(b)))

  /** Exact Jaccard similarity of the distinct character k-gram shingle sets
    * of lower(a) and lower(b). NULL when both sets are empty (0/0), matching
    * SQL division-by-zero semantics.
    */
  def shingleJaccard(a: Column, b: Column, k: Int): Column =
    col(ShingleJaccard(expr(a), expr(b), k))

  /** Dot product of two float-array columns, accumulated left-to-right in
    * double — bit-identical to the oracle's list_aggregate fold.
    */
  def floatVecDot(a: Column, b: Column): Column = col(FloatVecDot(expr(a), expr(b)))

  /** L2 norm of a float-array column (double accumulation, left-to-right). */
  def floatVecNorm(a: Column): Column = col(FloatVecNorm(expr(a)))

  /** SQUARED Euclidean distance of two float-array columns — the k-means
    * assignment metric. Per element (CAST double − CAST double)², summed
    * left-to-right: every term is IEEE-exact (a float-float difference is
    * representable in double), so the result is bit-identical to the
    * oracle's list_aggregate fold over the same casts.
    */
  def floatVecSqDist(a: Column, b: Column): Column = col(FloatVecSqDist(expr(a), expr(b)))

  // splitmix64 finalizer: cheap, well-mixed 64-bit hash family
  @inline private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit polynomial hash of chars [pos, pos+k). */
  @inline private[expressions] def windowHash(s: String, pos: Int, k: Int): Long = {
    var h = 1125899906842597L
    var i = pos
    val end = pos + k
    while (i < end) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  /** One-pass MinHash signature of lower(text)'s k-gram shingles. */
  private[expressions] def computeSig(s0: String, k: Int, numHashes: Int): Array[Long] = {
    val s = s0.toLowerCase(java.util.Locale.ROOT)
    val n = s.length - k + 1
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var pos = 0
    while (pos < n) {
      val h0 = windowHash(s, pos, k)
      var i = 0
      while (i < numHashes) {
        val h = mix64(h0 ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      pos += 1
    }
    sig
  }

  /** Distinct 64-bit hashes of lower(text)'s k-gram shingles, sorted —
    * the single-pass replacement for `explode(transform(sequence...))`
    * string shingling when only set membership matters (q62): no per-
    * window string materialization, 8-byte join keys instead of k-byte
    * strings. The 2⁻⁶⁴-collision caveat is the same one q15's hashed
    * verify carries (proven brute-equal at three SFs).
    */
  def shingleHashes(text: Column, k: Int): Column = col(ShingleHashes(expr(text), k))

  private[graft] def shingleHashSet(s0: String, k: Int): Array[Long] = {
    val s = s0.toLowerCase(java.util.Locale.ROOT)
    val n = s.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val arr = new Array[Long](n)
    var pos = 0
    while (pos < n) { arr(pos) = mix64(windowHash(s, pos, k)); pos += 1 }
    sortDedupe(arr)
  }

  private def sortDedupe(arr: Array[Long]): Array[Long] = {
    val n = arr.length
    java.util.Arrays.sort(arr)
    var w = 1
    var i = 1
    while (i < n) { if (arr(i) != arr(i - 1)) { arr(w) = arr(i); w += 1 }; i += 1 }
    if (w == n) arr else java.util.Arrays.copyOf(arr, w)
  }

  /** Byte-level fast path of [[shingleHashSet]] for pure-ASCII input (the
    * overwhelmingly common case in text corpora): no String materialization,
    * no toLowerCase copy (ASCII lowercase is +32 inline, identical to
    * String.toLowerCase there), and the k-gram polynomial is computed as a
    * ROLLING hash — h(i+1) = (h(i) − c(i)·31^(k−1))·31 + c(i+k) in wrapping
    * 64-bit arithmetic, the same residue mod 2⁶⁴ as the direct fold — so
    * per-document work drops from O(len·k) to O(len). k=40 spans (q78/q79)
    * pay 40× less hash work per char. Any non-ASCII byte falls back to the
    * exact char-path above; both paths hash identical int sequences for
    * ASCII content, so hashes agree across mixed corpora.
    */
  private[graft] def shingleHashSetUtf8(u: UTF8String, k: Int): Array[Long] = {
    val b = u.getBytes
    var j = 0
    while (j < b.length) {
      if (b(j) < 0) return shingleHashSet(u.toString, k)
      j += 1
    }
    val n = b.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    @inline def low(i: Int): Int = {
      val c = b(i).toInt
      if (c >= 'A' && c <= 'Z') c + 32 else c
    }
    // windowHash(p) = SEED·31^k + Σ_{j<k} c(p+j)·31^(k-1-j)  (wrapping),
    // so with pk = 31^(k-1) and A = SEED·31^k:
    //   h(p+1) = (h(p) − A − c(p)·pk)·31 + A + c(p+k)
    // — the same residue mod 2^64 as the direct fold, checked by PropertySpec
    // against windowHash on random text.
    val seed = 1125899906842597L
    var pk = 1L
    var e = 0
    while (e < k - 1) { pk *= 31L; e += 1 }
    val a0 = seed * pk * 31L
    val arr = new Array[Long](n)
    var h = seed
    var i = 0
    while (i < k) { h = h * 31 + low(i); i += 1 }
    arr(0) = mix64(h)
    var pos = 1
    while (pos < n) {
      h = (h - a0 - low(pos - 1) * pk) * 31L + a0 + low(pos + k - 1)
      arr(pos) = mix64(h)
      pos += 1
    }
    sortDedupe(arr)
  }

  /** Band keys (bands longs) from a signature. */
  private[expressions] def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rowsPerBand = sig.length / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x27d4eb2f165667c5L + b
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      keys(b) = h
      b += 1
    }
    keys
  }
}

/** See [[TextVecExprs.minHashBandKeys]]. Output: ArrayType(LongType) of
  * length `bands`; two documents sharing ANY band key are LSH candidates.
  * A document shorter than k has an empty shingle set: its signature is all
  * Long.MaxValue, so empty docs band together (and are later discarded by
  * the exact-verify 0/0 rule).
  */
case class MinHashBandKeys(child: Expression, k: Int, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be a multiple of bands")
  private val rowsPerBand = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  protected override def nullSafeEval(input: Any): Any = {
    import TextVecExprs._
    val sig = computeSig(input.asInstanceOf[UTF8String].toString, k, numHashes)
    new GenericArrayData(bandKeys(sig, bands))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** See [[TextVecExprs.shingleHashes]]. Codegen note (the r9 promise to
  * MEASURE the fallback cost on the hottest surfaces, kept in r10 — see
  * PERF.md round-10): `doGenCode` emits a direct call to [[hash]] on the
  * already-evaluated child value via `addReferenceObj`, replacing
  * CodegenFallback's per-row interpreted dispatch (re-eval of the child
  * subtree against INPUT_ROW + Object boxing through `Expression.eval`).
  * The O(len) hashing + sort work is identical either way — this only
  * strips the per-row glue, which is why the measured win is real but
  * bounded (data-proportional char work dominates).
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  /** Row kernel, public for the generated code. */
  def hash(s: UTF8String): ArrayData =
    new GenericArrayData(TextVecExprs.shingleHashSetUtf8(s, k))

  protected override def nullSafeEval(input: Any): Any =
    hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.hash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** See [[TextVecExprs.minHashSig]]. */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextVecExprs.computeSig(input.asInstanceOf[UTF8String].toString, k, numHashes))

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** See [[TextVecExprs.bandKeysFromSig]]. */
case class BandKeysFromSig(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys_from_sig"

  protected override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData].toLongArray()
    require(sig.length % bands == 0,
      s"signature length ${sig.length} must be a multiple of bands=$bands " +
        "(trailing hashes would be silently dropped)")
    new GenericArrayData(TextVecExprs.bandKeys(sig, bands))
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeysFromSig =
    copy(child = newChild)
}

/** See [[TextVecExprs.sigMatchCount]]. Full codegen (not CodegenFallback):
  * this runs per CANDIDATE PAIR inside the LSH join stage — the generated
  * loop keeps the whole join stage in whole-stage codegen with no
  * interpreted-eval row boxing.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(xs.length, ys.length)
    var m = 0
    var i = 0
    while (i < n) { if (xs(i) == ys(i)) m += 1; i += 1 }
    m
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchCount =
    copy(left = l, right = r)
}

/** See [[TextVecExprs.shingleJaccard]]: |A ∩ B| / |A ∪ B| over the k-gram
  * shingle sets of the lowercased inputs.
  *
  * Shingles are compared via 64-bit window hashes held in a primitive
  * open-addressing set (no substring allocation — ~8x faster than
  * HashSet[String] on the q15 verify path). A hash collision would perturb
  * the exact count with probability ~ (m^2)/2^64 per pair (~5e-15 at m≈300)
  * — far below any realistic corpus size; the test suite cross-checks the
  * result against the allocation-heavy exact-string formulation.
  */
case class ShingleJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  import TextVecExprs.{mix64, windowHash}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_jaccard"

  /** Open-addressing set of non-zero longs (0 is the empty slot; the mixed
    * hash is remapped away from 0).
    */
  private def fill(s0: String): (Array[Long], Int) = {
    val s = s0.toLowerCase(java.util.Locale.ROOT)
    val n = math.max(0, s.length - k + 1)
    var cap = 16
    while (cap < n * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var size = 0
    var pos = 0
    while (pos < n) {
      var h = mix64(windowHash(s, pos, k))
      if (h == 0) h = 1
      var idx = (h & mask).toInt
      while (table(idx) != 0 && table(idx) != h) idx = (idx + 1) & mask
      if (table(idx) == 0) { table(idx) = h; size += 1 }
      pos += 1
    }
    (table, size)
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (ta, na) = fill(a.asInstanceOf[UTF8String].toString)
    val (tb, nb) = fill(b.asInstanceOf[UTF8String].toString)
    val (small, large) = if (na <= nb) (ta, tb) else (tb, ta)
    val mask = large.length - 1
    var inter = 0
    var i = 0
    while (i < small.length) {
      val h = small(i)
      if (h != 0) {
        var idx = (h & mask).toInt
        while (large(idx) != 0 && large(idx) != h) idx = (idx + 1) & mask
        if (large(idx) == h) inter += 1
      }
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) null else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleJaccard =
    copy(left = l, right = r)
}

/** See [[TextVecExprs.floatVecDot]]. Full codegen: this is the inner loop
  * of every similarity join (q16 brute top-k, q29/q38 ANN scoring, q36's
  * blocked O(N²/B) pair scan — ~12.5M evaluations at sf0.1), so the
  * generated loop runs inside whole-stage codegen with zero per-row
  * interpreted-eval overhead.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    // direct element access: toFloatArray() would copy both vectors on
    // EVERY evaluation — 25M allocations across a 12.5M-pair brute scan
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** See [[TextVecExprs.floatVecNorm]]. Full codegen — same hot paths as
  * [[FloatVecDot]].
  */
case class FloatVecNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_norm"

  protected override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = xs.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
}

/** See [[TextVecExprs.floatVecSqDist]]. Full codegen — same hot path
  * discipline as [[FloatVecDot]] (no per-row array copies).
  */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_sqdist"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = xs.getFloat(i).toDouble - ys.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecSqDist =
    copy(left = l, right = r)
}
