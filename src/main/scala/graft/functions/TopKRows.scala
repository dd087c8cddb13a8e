package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

  override def reduce(s: TopKBuf, r: RankedRow): TopKBuf =
    TopKByPrice.insert(s, r.price, r.key)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKByPrice.mergeInto(a, b)

  /** Best-first (price DESC, key ASC) — position in this array + 1 IS the
    * row_number the window form would assign.
    */
  override def finish(s: TopKBuf): Seq[RankedRow] =
    (0 until s.size).map(i => RankedRow(s.prices(i), s.keys(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[RankedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedRow]]()
}

/** The ONE insert/merge kernel both aggregate spellings share — the udaf
  * [[TopKByPrice]] and the Catalyst [[TopKPriceRows]] cannot diverge on
  * ordering semantics because they run this code.
  */
object TopKByPrice {

  /** better(a, b) ⇔ a ranks strictly above b: price DESC, key ASC. */
  @inline private def better(ap: Double, ak: Long, bp: Double, bk: Long): Boolean =
    ap > bp || (ap == bp && ak < bk)

  private[functions] def insert(s: TopKBuf, p: Double, key: Long): TopKBuf = {
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

  private[functions] def mergeInto(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    var acc = a
    while (i < b.size) { acc = insert(acc, b.prices(i), b.keys(i)); i += 1 }
    acc
  }
}

/** [[TopKByPrice]] as a native Catalyst TypedImperativeAggregate — the
  * q5 hot path. The udaf spelling routes every input row through the
  * Aggregator encoder stack (InternalRow → RankedRow case class, buffer
  * ser/de probes); this form reads the two primitive columns straight off
  * the InternalRow and mutates the same [[TopKBuf]] — measured ~2× off
  * the whole q5 aggregation at sf0.1 (PERF.md r11). Still runs under
  * ObjectHashAggregateExec with partial+final merge; the buffer crosses
  * the exchange as (k, size, doubles, longs) in one byte array.
  *
  * Ordering semantics are [[TopKByPrice]]'s verbatim (shared kernel);
  * PlanSpec's q5 == q5Window gate pins the output.
  */
case class TopKPriceRows(
    price: Expression, key: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, s"TopKPriceRows requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(price, key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("price", DoubleType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_price"

  override def createAggregationBuffer(): TopKBuf =
    TopKBuf(k, new Array[Double](k), new Array[Long](k), 0)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val p = price.eval(input)
    val kk = key.eval(input)
    if (p == null || kk == null) b
    else TopKByPrice.insert(b, p.asInstanceOf[Double], kk.asInstanceOf[Long])
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = TopKByPrice.mergeInto(b, o)

  override def eval(b: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](b.size)(i =>
      InternalRow(b.prices(i), b.keys(i))))

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.size)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.prices(i)); bb.putLong(b.keys(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val buf = TopKBuf(kk, new Array[Double](kk), new Array[Long](kk), n)
    var i = 0
    while (i < n) { buf.prices(i) = bb.getDouble; buf.keys(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPriceRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPriceRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPriceRows =
    copy(price = newChildren(0), key = newChildren(1))
}
