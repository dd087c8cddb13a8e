package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for [[TopKByPrice]]: ranked by (price DESC, key ASC).
  * `key` must be unique within a group (q5: o_orderkey) so the order — and
  * therefore the aggregate's output — is total and deterministic at any
  * parallelism or merge order.
  */
case class RankedRow(price: Double, key: Long)

/** Aggregation buffer: at most `k` rows, kept sorted best-first. */
case class TopKBuf(k: Int, rows: Vector[RankedRow])

/** Bounded top-k-per-group as a typed Aggregator — the scale-correct
  * replacement for `row_number().over(partitionBy(g).orderBy(...)) <= k`.
  *
  * WindowExec must shuffle EVERY input row to its group's partition and
  * sort the whole partition before it can rank anything (WindowGroupLimit
  * prunes per-partition to k·groups rows pre-shuffle, but the post-shuffle
  * sort remains, and window evaluation is row-at-a-time). This aggregate
  * keeps a k-row sorted buffer per group instead: map-side partials bound
  * the exchange to k rows per (group, input partition), there is NO sort of
  * data rows anywhere (only k-element insertions), and the merge is
  * associative+commutative — the shape that survives a 100×
  * scale-up of rows-per-group untouched. Ranks are recovered afterwards by
  * `posexplode` over the already-ordered output array.
  *
  * State is O(k) per group, so executor memory scales with group count
  * exactly like any hash aggregate. Runs under ObjectHashAggregateExec;
  * see Session.local's `objectHashAggregate.sortBased.fallbackThreshold`
  * note for the hash-vs-sort fallback knob.
  */
class TopKByPrice(k: Int) extends Aggregator[RankedRow, TopKBuf, Seq[RankedRow]] {

  private def better(a: RankedRow, b: RankedRow): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  override def zero: TopKBuf = TopKBuf(k, Vector.empty)

  private def insert(s: TopKBuf, r: RankedRow): TopKBuf =
    if (s.rows.length >= s.k && !better(r, s.rows.last)) s // common case: O(1) reject
    else {
      val i = s.rows.indexWhere(better(r, _)) match {
        case -1 => s.rows.length
        case x  => x
      }
      val v = (s.rows.take(i) :+ r) ++ s.rows.drop(i)
      s.copy(rows = if (v.length > s.k) v.take(s.k) else v)
    }

  override def reduce(s: TopKBuf, r: RankedRow): TopKBuf = insert(s, r)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    b.rows.foldLeft(a)(insert)

  /** Best-first (price DESC, key ASC) — position in this array + 1 IS the
    * row_number the window form would assign.
    */
  override def finish(s: TopKBuf): Seq[RankedRow] = s.rows

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[RankedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedRow]]()
}
