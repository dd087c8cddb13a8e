package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator for one logistic-regression GD iteration: fixed-point long
  * sums — per-feature gradient [0, dim), bias gradient [dim], total
  * log-loss [dim+1] — MUTATED IN PLACE (the [[TopKBuf]] treatment).
  */
case class LrGradBuf(var g: Array[Long])

/** One whole batch-GD iteration as a single typed Aggregator — the r11
  * rebuild of [[graft.queries.Pipeline.lrTrain]]'s inner job.
  *
  * The r10 form computed per-doc margins in a Column projection against a
  * broadcast weight literal, EXPLODED per-feature gradient rows
  * (~tokens-per-doc fan-out) and aggregated them through a dim-keyed
  * partial+final shuffle — ~64 near-empty tasks per iteration at
  * local[32], which made q90's 40 sequential iterations task-dispatch
  * bound (~0.17 s/iter measured, PERF.md r11). This aggregator does the
  * identical arithmetic inside one GLOBAL aggregation: the margin, sigmoid
  * and loss compute per row in plain JVM code against the
  * constructor-captured weights, accumulate into one long[dim+2] buffer,
  * and the 8 KB per-partition partials merge with no exchange at all —
  * lrTrain drives this kernel through a one-stage `mapPartitions` +
  * `RDD.reduce` (incremental driver-side merge; the Aggregator
  * zero/reduce/merge shape is exactly that contract, and the udaf
  * spelling remains valid for SQL use).
  *
  * MODEL-IDENTITY CONTRACT: every floating-point operation replicates the
  * r10 Column expressions' value and ORDER exactly — dot added in array
  * order then scaled by 1/√k (k = max(|fs|,1)), sigmoid via math.exp, the
  * 1e-12 probability clamp, and the same floor(x·1e6+0.5) fixed-pointing
  * BEFORE the (commutative, long) distributed sum — so the trained model
  * is bit-identical to the r10 implementation's (verified against a
  * captured r10 model) and remains layout-deterministic (spec-pinned
  * under repartition).
  *
  * Scale: per-partition state is O(dim), the collect is one dim+2 row;
  * driver state stays the dim-sized model — the same bounded-fixpoint
  * class as ivfTrain/pqTrain.
  */
class LrGradient(w: Array[Double], b: Double)
    extends Aggregator[(Double, Seq[Int]), LrGradBuf, Seq[Long]] {

  private val dim = w.length

  override def zero: LrGradBuf = LrGradBuf(new Array[Long](dim + 2))

  @inline private def fix(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  override def reduce(s: LrGradBuf, in: (Double, Seq[Int])): LrGradBuf = {
    val y = in._1
    val fs = in._2
    var dot = 0.0
    val it = fs.iterator // array order — the HOF aggregate's IEEE sum order
    while (it.hasNext) dot += w(it.next())
    val inv = 1.0 / math.sqrt(math.max(fs.size, 1).toDouble)
    val margin = dot * inv + b
    val p = 1.0 / (1.0 + math.exp(-margin))
    val ll = -(y * math.log(math.max(p, 1e-12)) +
      (1.0 - y) * math.log(math.max(1.0 - p, 1e-12)))
    val c = fix((p - y) * inv)
    val it2 = fs.iterator
    while (it2.hasNext) s.g(it2.next()) += c
    s.g(dim) += fix(p - y)
    s.g(dim + 1) += fix(ll)
    s
  }

  override def merge(a: LrGradBuf, o: LrGradBuf): LrGradBuf = {
    var i = 0
    while (i < a.g.length) { a.g(i) += o.g(i); i += 1 }
    a
  }

  override def finish(s: LrGradBuf): Seq[Long] = s.g.toSeq

  override def bufferEncoder: Encoder[LrGradBuf] = Encoders.product[LrGradBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
