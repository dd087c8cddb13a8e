package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-user session-interval state: disjoint [start, end] microsecond
  * intervals sorted by start, with > gap between consecutive intervals
  * (so each interval IS one session — a maximal chain of events whose
  * consecutive gaps are all ≤ gap). Parallel primitive arrays MUTATED IN
  * PLACE (the [[TopKBuf]] treatment — the r10 Vector form allocated two
  * fresh Vectors per inserted event, measurable on q12's 600k-event
  * shuffle); the arrays are var so insert can grow them, `size` is a var
  * constructor param so the product encoder still round-trips the buffer
  * through the partial/final exchange.
  */
case class SessBuf(var starts: Array[Long], var ends: Array[Long], var size: Int)

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
  * exchange carries interval arrays (≤ 2 longs per unmerged event, usually
  * far fewer), and NO sort of data rows happens anywhere.
  *
  * State is O(sessions-per-user seen in the partition) — bounded by event
  * count in the worst case but typically tiny; a pathological single-user
  * skew degrades to the same O(n log n) work the sort did, just inside the
  * aggregate. Inserts are O(log n) search + memmove: events arrive roughly
  * time-ordered per partition, so the moved suffix is almost always empty.
  *
  * Gap semantics match q12's lag form exactly: a gap STRICTLY greater than
  * `gapMicros` starts a new session (ties at exactly the gap merge).
  */
class SessionCount(gapMicros: Long) extends Aggregator[Long, SessBuf, Long] {

  override def zero: SessBuf = SessBuf(new Array[Long](4), new Array[Long](4), 0)

  /** Insert interval [x1, x2], merging every interval within gap reach —
    * in place, returning the same buffer.
    */
  private def insert(s: SessBuf, x1: Long, x2: Long): SessBuf = {
    val lo = x1 - gapMicros
    val hi = x2 + gapMicros
    // first interval reachable from x: binary search on (sorted) ends
    var a = 0
    var b = s.size
    while (a < b) {
      val m = (a + b) >>> 1
      if (s.ends(m) >= lo) b = m else a = m + 1
    }
    val first = a
    // past-the-end of the reachable run (starts are sorted; the run is
    // about to collapse into one interval)
    var last = first
    while (last < s.size && s.starts(last) <= hi) last += 1
    if (first == last) {
      if (s.size == s.starts.length) {
        val ns = new Array[Long](s.size * 2)
        System.arraycopy(s.starts, 0, ns, 0, s.size)
        s.starts = ns
        val ne = new Array[Long](s.size * 2)
        System.arraycopy(s.ends, 0, ne, 0, s.size)
        s.ends = ne
      }
      System.arraycopy(s.starts, first, s.starts, first + 1, s.size - first)
      System.arraycopy(s.ends, first, s.ends, first + 1, s.size - first)
      s.starts(first) = x1
      s.ends(first) = x2
      s.size += 1
    } else {
      s.starts(first) = math.min(x1, s.starts(first))
      s.ends(first) = math.max(x2, s.ends(last - 1))
      val drop = last - first - 1
      if (drop > 0) {
        System.arraycopy(s.starts, last, s.starts, first + 1, s.size - last)
        System.arraycopy(s.ends, last, s.ends, first + 1, s.size - last)
        s.size -= drop
      }
    }
    s
  }

  override def reduce(s: SessBuf, tsMicros: Long): SessBuf =
    insert(s, tsMicros, tsMicros)

  override def merge(a: SessBuf, b: SessBuf): SessBuf =
    if (a.size >= b.size) {
      var i = 0
      while (i < b.size) { insert(a, b.starts(i), b.ends(i)); i += 1 }
      a
    } else {
      var i = 0
      while (i < a.size) { insert(b, a.starts(i), a.ends(i)); i += 1 }
      b
    }

  /** Number of merged intervals == number of sessions. */
  override def finish(s: SessBuf): Long = s.size.toLong

  override def bufferEncoder: Encoder[SessBuf] = Encoders.product[SessBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  // kernel access for the Catalyst spelling — ONE insert definition
  private[functions] def insertInto(s: SessBuf, x1: Long, x2: Long): SessBuf =
    insert(s, x1, x2)
}

/** [[SessionCount]] as a native Catalyst TypedImperativeAggregate (the
  * [[TopKPriceRows]] treatment): the timestamp reads straight off the
  * InternalRow instead of round-tripping the udaf encoder stack per
  * event. Interval semantics are [[SessionCount]]'s verbatim — both
  * spellings run its insert kernel — and AsofSpec's q12 == q12LagWindow
  * gate pins the output. The buffer crosses the exchange as
  * (size, starts, ends) in one byte array.
  */
case class SessionCountRows(
    ts: Expression, gapMicros: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SessBuf] {

  @transient private lazy val kernel = new SessionCount(gapMicros)

  override def children: Seq[Expression] = Seq(ts)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "session_count"

  override def createAggregationBuffer(): SessBuf =
    SessBuf(new Array[Long](4), new Array[Long](4), 0)

  override def update(b: SessBuf, input: InternalRow): SessBuf = {
    val v = ts.eval(input)
    if (v == null) b
    else {
      val t = v.asInstanceOf[Long]
      kernel.insertInto(b, t, t)
    }
  }

  override def merge(b: SessBuf, o: SessBuf): SessBuf = {
    if (b.size >= o.size) {
      var i = 0
      while (i < o.size) { kernel.insertInto(b, o.starts(i), o.ends(i)); i += 1 }
      b
    } else {
      var i = 0
      while (i < b.size) { kernel.insertInto(o, b.starts(i), b.ends(i)); i += 1 }
      o
    }
  }

  override def eval(b: SessBuf): Any = b.size.toLong

  override def serialize(b: SessBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.starts(i)); bb.putLong(b.ends(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SessBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val cap = math.max(4, n)
    val buf = SessBuf(new Array[Long](cap), new Array[Long](cap), n)
    var i = 0
    while (i < n) { buf.starts(i) = bb.getLong; buf.ends(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SessionCountRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SessionCountRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SessionCountRows =
    copy(ts = newChildren(0))
}
