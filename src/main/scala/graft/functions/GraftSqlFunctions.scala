package graft.functions

import graft.expressions._
import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for graft's custom Catalyst expressions: every expression
  * the Column API exposes is also callable from `spark.sql` once
  * registered, so SQL-first users get the same single-pass operators
  * (MinHash, SimHash, SRP, IVF-free vector ops, fingerprinting).
  *
  * Two registration paths, same function list:
  *  - [[GraftSqlFunctions.register]] on a live session (tests, notebooks);
  *  - [[graft.GraftExtensions]] via the `spark.sql.extensions` conf for
  *    cluster deployments (builder-time injection).
  *
  * Hyper-parameters (k, bands, planes…) must be INTEGER LITERALS — they
  * parameterize the expression instance itself.
  */
object GraftSqlFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litStr(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def bad(fn: String, got: Seq[Expression]): Nothing =
    throw new IllegalArgumentException(s"$fn: wrong argument count (${got.length})")

  /** (name, builder) for every exposed function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> {
      case Seq(t, k, n) =>
        MinHashSig(t, litInt(k, "graft_minhash_sig", "k"), litInt(n, "graft_minhash_sig", "numHashes"))
      case o => bad("graft_minhash_sig", o)
    },
    "graft_minhash_band_keys" -> {
      case Seq(t, k, n, b) => MinHashBandKeys(t,
        litInt(k, "graft_minhash_band_keys", "k"),
        litInt(n, "graft_minhash_band_keys", "numHashes"),
        litInt(b, "graft_minhash_band_keys", "bands"))
      case o => bad("graft_minhash_band_keys", o)
    },
    "graft_band_keys" -> {
      case Seq(sig, b) => BandKeysFromSig(sig, litInt(b, "graft_band_keys", "bands"))
      case o => bad("graft_band_keys", o)
    },
    "graft_sig_match_count" -> {
      case Seq(a, b) => SigMatchCount(a, b)
      case o => bad("graft_sig_match_count", o)
    },
    "graft_shingle_jaccard" -> {
      case Seq(a, b, k) => ShingleJaccard(a, b, litInt(k, "graft_shingle_jaccard", "k"))
      case o => bad("graft_shingle_jaccard", o)
    },
    "graft_simhash64" -> {
      case Seq(t) => SimHash64(t)
      case o => bad("graft_simhash64", o)
    },
    "graft_fingerprint" -> {
      case Seq(t) => PolyFingerprint(t)
      case o => bad("graft_fingerprint", o)
    },
    "graft_json_probe" -> {
      case Seq(j, k) => JsonScalarProbe(j, litStr(k, "graft_json_probe", "key"))
      case o => bad("graft_json_probe", o)
    },
    "graft_json_int" -> {
      case Seq(j, k) => JsonIntProbe(j, litStr(k, "graft_json_int", "key"))
      case o => bad("graft_json_int", o)
    },
    "graft_trigram_hashes" -> {
      case Seq(t) => WordTrigramHashes(t)
      case o => bad("graft_trigram_hashes", o)
    },
    "graft_sorted_intersect_count" -> {
      case Seq(a, b) => SortedLongIntersectCount(a, b)
      case o => bad("graft_sorted_intersect_count", o)
    },
    "graft_vec_sqdist" -> {
      case Seq(a, b) => FloatVecSqDist(a, b)
      case o => bad("graft_vec_sqdist", o)
    },
    "graft_srp_bucket" -> {
      case Seq(v, p) => SrpBucket(v, litInt(p, "graft_srp_bucket", "planes"))
      case o => bad("graft_srp_bucket", o)
    },
    "graft_vec_dot" -> {
      case Seq(a, b) => FloatVecDot(a, b)
      case o => bad("graft_vec_dot", o)
    },
    "graft_vec_norm" -> {
      case Seq(a) => FloatVecNorm(a)
      case o => bad("graft_vec_norm", o)
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftSqlFunctions.type].getName, name)

  /** Register every graft function on a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftColumnBridge.registerFunction(
        spark, FunctionIdentifier(name), info(name), builder)
    }

  /** Builder-time injection (used by [[graft.GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
}
