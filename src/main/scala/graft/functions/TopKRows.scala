package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for [[TopKByPrice]]: ranked by (price DESC, key ASC).
  * `key` must be unique within a group (q5: o_orderkey) so the order — and
  * therefore the aggregate's output — is total and deterministic at any
  * parallelism or merge order.
  */
case class RankedRow(price: Double, key: Long)

/** Aggregation buffer: parallel primitive arrays holding at most `k` rows
  * sorted best-first, MUTATED IN PLACE (the Aggregator contract allows
  * returning the same buffer instance from reduce/merge) — the immutable
  * Vector form allocated ~4 objects per input row, measurable at 150k
  * rows/group-set. `size` is a var constructor param so the product
  * encoder still round-trips the buffer through the partial/final
  * exchange.
  */
case class TopKBuf(k: Int, prices: Array[Double], keys: Array[Long], var size: Int)

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
  * associative+commutative — the shape that survives a 100× scale-up of
  * rows-per-group untouched. Ranks are recovered afterwards by
  * `posexplode` over the already-ordered output array.
  *
  * State is O(k) per group, so executor memory scales with group count
  * exactly like any hash aggregate. Runs under ObjectHashAggregateExec;
  * see Session.local's `objectHashAggregate.sortBased.fallbackThreshold`
  * note for the hash-vs-sort fallback knob.
  */
class TopKByPrice(k: Int) extends Aggregator[RankedRow, TopKBuf, Seq[RankedRow]] {

  require(k > 0, s"TopKByPrice requires k > 0, got $k") // insert() reads slot k-1 when full

  override def zero: TopKBuf =
    TopKBuf(k, new Array[Double](k), new Array[Long](k), 0)

  /** better(a, b) ⇔ a ranks strictly above b: price DESC, key ASC. */
  @inline private def better(ap: Double, ak: Long, bp: Double, bk: Long): Boolean =
    ap > bp || (ap == bp && ak < bk)

  private def insert(s: TopKBuf, p: Double, key: Long): TopKBuf = {
    val n = s.size
    if (n >= s.k && !better(p, key, s.prices(n - 1), s.keys(n - 1))) s // O(1) reject
    else {
      var i = 0
      while (i < n && !better(p, key, s.prices(i), s.keys(i))) i += 1
      val last = math.min(n, s.k - 1) // slot k-1 falls off when full
      var j = last
      while (j > i) {
        s.prices(j) = s.prices(j - 1); s.keys(j) = s.keys(j - 1); j -= 1
      }
      s.prices(i) = p
      s.keys(i) = key
      if (n < s.k) s.size = n + 1
      s
    }
  }

  override def reduce(s: TopKBuf, r: RankedRow): TopKBuf =
    insert(s, r.price, r.key)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    var acc = a
    while (i < b.size) { acc = insert(acc, b.prices(i), b.keys(i)); i += 1 }
    acc
  }

  /** Best-first (price DESC, key ASC) — position in this array + 1 IS the
    * row_number the window form would assign.
    */
  override def finish(s: TopKBuf): Seq[RankedRow] =
    (0 until s.size).map(i => RankedRow(s.prices(i), s.keys(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[RankedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedRow]]()
}
