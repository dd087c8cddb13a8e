package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-user session-interval state: disjoint [start, end] microsecond
  * intervals sorted by start, with > gap between consecutive intervals
  * (so each interval IS one session — a maximal chain of events whose
  * consecutive gaps are all ≤ gap).
  */
case class SessState(iv: Vector[(Long, Long)])

/** Session COUNTING as a mergeable interval aggregate — the scale-correct
  * replacement for the lag-window sessionization pass when only the count
  * (not the session ids) is needed.
  *
  * The window form shuffles every event to its user's partition and sorts
  * the partition before lag() can see a gap. This aggregate instead treats
  * "same session" as what it is — the transitive closure of the ≤gap
  * relation on the time line — whose equivalence classes are exactly the
  * merged intervals kept here. Inserting an event extends/bridges the
  * intervals it lands within gap of; merging two partial states is
  * interval-set union with the same rule, so the aggregate is associative
  * and commutative and the result is independent of partitioning and merge
  * order. Map-side partials pre-merge each partition's events, the
  * exchange carries interval lists (≤ 2 longs per unmerged event, usually
  * far fewer), and NO sort of data rows happens anywhere.
  *
  * State is O(sessions-per-user seen in the partition) — bounded by event
  * count in the worst case but typically tiny; a pathological single-user
  * skew degrades to the same O(n log n) work the sort did, just inside the
  * aggregate.
  *
  * Gap semantics match q12's lag form exactly: a gap STRICTLY greater than
  * `gapMicros` starts a new session (ties at exactly the gap merge).
  */
class SessionCount(gapMicros: Long) extends Aggregator[Long, SessState, Long] {

  override def zero: SessState = SessState(Vector.empty)

  private def insert(s: SessState, x: (Long, Long)): SessState = {
    val iv = s.iv
    val lo = x._1 - gapMicros
    val hi = x._2 + gapMicros
    // first interval reachable from x: binary search on (sorted) ends
    var a = 0
    var b = iv.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (iv(m)._2 >= lo) b = m else a = m + 1
    }
    val first = a
    // past-the-end of the reachable run (starts are sorted; the run is
    // short — it is about to collapse into one interval)
    var last = first
    while (last < iv.length && iv(last)._1 <= hi) last += 1
    if (first == last) SessState((iv.take(first) :+ x) ++ iv.drop(first))
    else {
      val ns = math.min(x._1, iv(first)._1)
      val ne = math.max(x._2, iv(last - 1)._2)
      SessState((iv.take(first) :+ ((ns, ne))) ++ iv.drop(last))
    }
  }

  override def reduce(s: SessState, tsMicros: Long): SessState =
    insert(s, (tsMicros, tsMicros))

  override def merge(a: SessState, b: SessState): SessState =
    if (a.iv.length >= b.iv.length) b.iv.foldLeft(a)(insert)
    else a.iv.foldLeft(b)(insert)

  /** Number of merged intervals == number of sessions. */
  override def finish(s: SessState): Long = s.iv.length.toLong

  override def bufferEncoder: Encoder[SessState] = Encoders.product[SessState]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
