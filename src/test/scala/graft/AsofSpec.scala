package graft

import graft.queries.Events

/** The two as-of implementations (join+window and union+single-sort) must
  * agree — the latter is the 100 TB path (one exchange, no per-user join
  * fan-out) and is only trusted because of this equivalence.
  */
class AsofSpec extends SparkSpec {

  test("q21 join+window == asofUnionWindow at sf0.001") {
    val a = Events.q21(spark, sf0001)
    val b = Events.asofUnionWindow(spark, sf0001)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q21 join+window == asofUnionWindow at sf0.01") {
    val a = Events.q21(spark, sf001)
    val b = Events.asofUnionWindow(spark, sf001)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("session_window count equals batch lag/cumsum sessionization") {
    val batch = Events.q12(spark, sf0001).head.getLong(0)
    val sw = Events.q12s(spark, sf0001).head.getLong(0)
    assert(batch == sw, s"batch=$batch session_window=$sw")
  }
}
