package graft

import graft.operators.{Graph, SkewJoin}
import graft.queries.TextVec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Operator-utility specs: connected components vs driver-side union-find,
  * salted join vs plain join.
  */
class OperatorsSpec extends SparkSpec {

  test("dupGroups == union-find on the q15 pair list") {
    val pairs = TextVec.q15(spark, sf001).select("ida", "idb")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // reference: driver-side union-find
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Graph.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("connectedComponents handles a deep chain (pointer-jumping, diameter 99)") {
    import spark.implicits._
    // a 100-node chain (needs O(log n) rounds, not O(n)) + isolated pair
    val edges = ((1L to 100L).sliding(2).map(s => (s(0), s(1))).toSeq :+ (200L, 201L))
      .toDF("ida", "idb")
    val comp = Graph.connectedComponents(edges, "ida", "idb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 100L).forall(comp(_) == 1L))
    assert(comp(200L) == 200L && comp(201L) == 200L)
  }

  test("connectedComponents throws rather than returning unconverged labels") {
    import spark.implicits._
    val chain = (1L to 60L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("ida", "idb")
    intercept[IllegalStateException] {
      Graph.connectedComponents(chain, "ida", "idb", maxIter = 2).collect()
    }
  }

  test("connectedComponents reliable mode: requires a checkpoint dir, then matches local mode") {
    import spark.implicits._
    val edges = ((1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq :+ (300L, 301L))
      .toDF("ida", "idb")
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // refuses to invent a driver-local dir (invisible to remote executors)
      intercept[IllegalStateException] {
        Graph.connectedComponents(edges, "ida", "idb", reliable = true)
      }
    }
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString)
    val local = Graph.connectedComponents(edges, "ida", "idb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = Graph.connectedComponents(edges, "ida", "idb", reliable = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel == local)
  }

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = (1 to 2000).map(i => (i.toLong, if (i <= 1800) 7L else (i % 50).toLong))
      .toDF("row_id", "k")
    val dim = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    val plain = skewed.join(dim, "k").select("row_id", "k", "payload")
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", "row_id", 8)
      .select("row_id", "k", "payload")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
