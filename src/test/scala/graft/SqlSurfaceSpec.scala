package graft

import graft.queries.Relational

/** The spark.sql surface over registered views must agree with the
  * DataFrame DSL implementations — users of the engine can mix both.
  * (The oracle contract itself is DSL-defined; this pins the SQL path.)
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views == DataFrame DSL (q1, q6)") {
    Tables.registerViews(spark, sf0001)
    val sqlQ1 = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(round(l_quantity*10000) AS BIGINT)) AS DOUBLE)/10000.0, 2) AS sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
    val dslQ1 = Relational.q1(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty")
    assert(sqlQ1.exceptAll(dslQ1).isEmpty && dslQ1.exceptAll(sqlQ1).isEmpty)

    val sqlQ6 = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin)
    val dslQ6 = Relational.q6(spark, sf0001)
    assert(sqlQ6.collect().toSeq == dslQ6.collect().toSeq)
  }

  test("registered graft_* SQL functions == Column API expressions") {
    import graft.expressions.{PipelineExprs, TextVecExprs}
    import org.apache.spark.sql.functions._
    graft.functions.GraftSqlFunctions.register(spark)
    Tables.registerViews(spark, sf0001)
    // text expressions over documents
    val sqlText = spark.sql(
      """SELECT doc_id, graft_simhash64(text) sh, graft_fingerprint(text) fp,
        |  graft_minhash_sig(text, 8, 16) sig,
        |  graft_minhash_band_keys(text, 8, 16, 8) bk
        |FROM documents ORDER BY doc_id""".stripMargin)
    val dslText = Tables.documents(spark, sf0001).select(
      col("doc_id"),
      PipelineExprs.simHash64(col("text")).as("sh"),
      PipelineExprs.polyFingerprint(col("text")).as("fp"),
      TextVecExprs.minHashSig(col("text"), 8, 16).as("sig"),
      TextVecExprs.minHashBandKeys(col("text"), 8, 16, 8).as("bk"))
      .orderBy("doc_id")
    assert(sqlText.collect().toSeq == dslText.collect().toSeq)
    // vector expressions over embeddings
    val sqlVec = spark.sql(
      """SELECT vec_id, round(graft_vec_norm(embedding), 6) n,
        |  graft_srp_bucket(embedding, 8) b,
        |  round(graft_vec_dot(embedding, embedding), 4) d
        |FROM embeddings ORDER BY vec_id""".stripMargin)
    val dslVec = Tables.embeddings(spark, sf0001).select(
      col("vec_id"),
      round(TextVecExprs.floatVecNorm(col("embedding")), 6).as("n"),
      PipelineExprs.srpBucket(col("embedding"), 8).as("b"),
      round(TextVecExprs.floatVecDot(col("embedding"), col("embedding")), 4).as("d"))
      .orderBy("vec_id")
    assert(sqlVec.collect().toSeq == dslVec.collect().toSeq)
    // round-7 additions: JSON probe, hashed trigram sets + intersect, sqdist
    val sqlNew = spark.sql(
      """SELECT d.doc_id,
        |  graft_trigram_hashes(d.text) th,
        |  graft_sorted_intersect_count(graft_trigram_hashes(d.text),
        |                               graft_trigram_hashes(d.text)) ic,
        |  round(graft_vec_sqdist(e.embedding, e.embedding), 6) sq,
        |  graft_json_probe('{"k":' || CAST(d.doc_id AS STRING) || '}', 'k') jp,
        |  graft_json_int('{"k":' || CAST(d.doc_id AS STRING) || '}', 'k') ji
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin)
    val dslNew = Tables.documents(spark, sf0001).as("d")
      .join(Tables.embeddings(spark, sf0001).as("e"), col("d.doc_id") === col("e.vec_id"))
      .select(col("d.doc_id"),
        PipelineExprs.wordTrigramHashes(col("d.text")).as("th"),
        PipelineExprs.sortedLongIntersectCount(
          PipelineExprs.wordTrigramHashes(col("d.text")),
          PipelineExprs.wordTrigramHashes(col("d.text"))).as("ic"),
        round(TextVecExprs.floatVecSqDist(col("e.embedding"), col("e.embedding")), 6).as("sq"),
        PipelineExprs.jsonScalarProbe(
          concat(lit("{\"k\":"), col("d.doc_id").cast("string"), lit("}")), "k").as("jp"),
        PipelineExprs.jsonIntProbe(
          concat(lit("{\"k\":"), col("d.doc_id").cast("string"), lit("}")), "k").as("ji"))
      .orderBy("doc_id")
    assert(sqlNew.collect().toSeq == dslNew.collect().toSeq)
    // hyper-parameters must be literals
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(text, CAST(len(text) AS INT), 16) FROM documents").collect()
    }
    assert(err.getMessage.contains("integer literal"))
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_json_probe(text, text) FROM documents").collect()
    }
    assert(err2.getMessage.contains("string literal"))
  }

  test("events view carries the microsecond timestamp (nanos handled)") {
    Tables.registerViews(spark, sf0001)
    val r = spark.sql(
      "SELECT count(DISTINCT user_id) AS du, max(ts) AS mx FROM events").head()
    assert(r.getLong(0) > 0)
    assert(r.get(1).isInstanceOf[java.sql.Timestamp])
  }
}
