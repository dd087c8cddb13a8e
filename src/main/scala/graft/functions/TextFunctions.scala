package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives as native Column combinators (no UDFs).
  *
  * These are the scalar building blocks for the LLM-data operators
  * (dedup, near-dup, language id, quality scoring, fingerprinting).
  * They compile to Catalyst higher-order-function expressions, so they
  * parallelize per-row with no shuffle and no driver involvement.
  */
object TextFunctions {

  /** Distinct character k-gram shingles of lower(text).
    * Positions are 1-based; a document shorter than k yields an empty array.
    * The length guard is explicit because Spark's sequence(1, 0) yields
    * [1, 0] (step defaults to -1), not [] — see ADVICE r01.
    */
  def shingles(text: Column, k: Int): Column = {
    val lowered = lower(text)
    when(length(lowered) >= k,
      array_distinct(
        transform(
          sequence(lit(1), length(lowered) - (k - 1)),
          i => substring(lowered, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Whitespace tokens of the raw text, empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Number of non-empty whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Exact Jaccard similarity of two (already-distinct) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** MinHash signature: array of `n` min-hash values over the shingle set.
    * Hash family: xxhash64(shingle, seed) for seed = 0..n-1 — deterministic,
    * codegen'd, and identically distributed per seed.
    * Empty shingle set => signature of Long.MaxValue (never collides with
    * a real min since xxhash64 of a non-empty set is < MaxValue w.h.p.).
    */
  def minHashSignature(shingleSet: Column, n: Int): Column =
    array((0 until n).map { seed =>
      coalesce(
        array_min(transform(shingleSet, s => xxhash64(s, lit(seed)))),
        lit(Long.MaxValue))
    }: _*)

  /** LSH band keys: the signature split into `bands` bands of `rowsPerBand`
    * values; each band hashed to one long. Output: array of `bands` longs.
    * Two docs sharing ANY band key become a candidate pair.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1))
      xxhash64(cols: _*)
    }: _*)

  /** 64-bit SimHash over whitespace tokens: sign-sum of per-token xxhash64
    * bits. Computed with bit arithmetic in the engine (no UDF): for each of
    * the 64 bit positions, count tokens whose hash has that bit set; bit is
    * set in the result if count*2 > total.
    */
  def simHash(text: Column): Column = {
    val toks = tokens(lower(text))
    val hashes = transform(toks, t => xxhash64(t))
    val total = size(toks)
    val bitCols: Seq[Column] = (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)).cast("int"))
      when(cnt * 2 > total, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** Polynomial rolling-hash fingerprint of the full text, mod 1e9+7.
    * Deterministic and expressible in both Spark and the DuckDB oracle
    * (left fold over code points).
    */
  def fingerprint(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch).cast("bigint"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
  }

  /** English stopword-hit count over lowercase whitespace tokens. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  def stopwordHits(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(sw, t)))
  }

  /** Heuristic quality score in [0,1]: mixes token-length sanity, alpha
    * ratio, and stopword presence. Deterministic integer/double arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val avgTokLen = when(nTok > 0, nChar / nTok).otherwise(lit(0.0))
    val lenScore = when(avgTokLen >= 3 && avgTokLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val alphaRatio = when(nChar > 0,
      (nChar - length(regexp_replace(text, "[a-zA-Z ]", ""))) / nChar).otherwise(lit(0.0))
    val swRatio = when(nTok > 0, stopwordHits(text).cast("double") / nTok).otherwise(lit(0.0))
    val swScore = when(swRatio > 0.02, lit(1.0)).otherwise(lit(0.5))
    round((lenScore + alphaRatio + swScore) / 3.0, 4)
  }
}
