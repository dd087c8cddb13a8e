package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — constant-size
  * mergeable state for frequent-item detection over unbounded streams.
  *
  * State: at most k (item, counter) pairs. Classic guarantee: every item
  * with true frequency > n/(k+1) is IN the final sketch, and each kept
  * counter underestimates the true count by at most n/(k+1). Merge (for
  * distributed partial aggregation) follows Agarwal et al.'s mergeable-
  * summaries construction: sum counters pairwise, then subtract the
  * (k+1)-th largest counter from all and drop non-positives — the merged
  * sketch keeps the same error bound, so map-side partials combine exactly
  * like any algebraic aggregate.
  *
  * The sketch yields CANDIDATES (superset of the true heavy hitters), not
  * exact counts — the intended two-pass pattern at 100 TB is sketch ->
  * tiny candidate set -> exact count of candidates only (see
  * Pipeline.q47), which turns an unbounded-cardinality groupBy into a
  * bounded-state scan plus a filtered exact aggregation.
  */
case class MgState(k: Int, items: Map[String, Long])

class MisraGries(k: Int) extends Aggregator[String, MgState, Map[String, Long]] {

  override def zero: MgState = MgState(k, Map.empty)

  override def reduce(s: MgState, item: String): MgState =
    s.items.get(item) match {
      case Some(c) => s.copy(items = s.items.updated(item, c + 1))
      case None if s.items.size < k => s.copy(items = s.items.updated(item, 1L))
      case None =>
        // decrement-all step: drop items hitting zero (amortized O(1) per
        // arrival over the sketch lifetime)
        s.copy(items = s.items.flatMap { case (i, c) =>
          if (c > 1) Some(i -> (c - 1)) else None
        })
    }

  override def merge(a: MgState, b: MgState): MgState = {
    val summed = b.items.foldLeft(a.items) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) a.copy(items = summed)
    else {
      // subtract the (k+1)-th largest counter, keep strictly positive
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      a.copy(items = summed.flatMap { case (i, c) =>
        if (c - cut > 0) Some(i -> (c - cut)) else None
      })
    }
  }

  override def finish(s: MgState): Map[String, Long] = s.items

  override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Typed column usable in ds.select(...) over a string column. */
  def apply(k: Int = 64): TypedColumn[String, Map[String, Long]] =
    new MisraGries(k).toColumn
}
