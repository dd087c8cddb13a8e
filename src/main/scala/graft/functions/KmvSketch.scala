package graft.functions

import graft.expressions.TextVecExprs.mix64
import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch as a typed Aggregator — the
  * custom-UDAF surface (SURVEY.md §2.2 row 45).
  *
  * State: the k smallest 64-bit hashes seen (a deterministic "bottom-k by
  * hash" sample of the distinct values). Mergeable (union = merge + retain
  * k smallest), constant size, and yields a distinct-count estimate
  * (k-1) / normalized(k-th smallest hash) — the classic KMV estimator.
  * Unlike HLL it also IS a uniform sample of distinct keys, which is what
  * a dedup pipeline wants for eyeballing clusters.
  *
  * Deterministic: the hash is fixed (splitmix64), so the same input set
  * gives the same sketch at any parallelism or merge order.
  */
case class KmvState(k: Int, hashes: Vector[Long])

class KmvDistinct(k: Int) extends Aggregator[Long, KmvState, Double] {

  override def zero: KmvState = KmvState(k, Vector.empty)

  private def insert(s: KmvState, h: Long): KmvState = {
    // keep the k smallest distinct hashes; hashes sorted ascending
    if (s.hashes.length >= k && h >= s.hashes.last) s
    else {
      val idx = s.hashes.search(h) match {
        case scala.collection.Searching.Found(_) => -1 // duplicate
        case scala.collection.Searching.InsertionPoint(i) => i
      }
      if (idx < 0) s
      else {
        val v = (s.hashes.take(idx) :+ h) ++ s.hashes.drop(idx)
        s.copy(hashes = if (v.length > k) v.take(k) else v)
      }
    }
  }

  override def reduce(s: KmvState, value: Long): KmvState = insert(s, mix64(value))

  override def merge(a: KmvState, b: KmvState): KmvState =
    b.hashes.foldLeft(a)(insert)

  /** KMV estimate: (k-1) / F(h_k) with F the fraction of the hash space
    * below the k-th smallest. Exact count when fewer than k distinct seen.
    */
  override def finish(s: KmvState): Double =
    if (s.hashes.length < k) s.hashes.length.toDouble
    else {
      // k-th smallest hash as an UNSIGNED fraction of the hash space.
      // (u.toDouble on the xor'd value would go negative once the k-th
      // smallest signed hash is positive — i.e. whenever n_distinct is
      // between k and ~2k — yielding negative estimates.)
      val u = s.hashes.last ^ Long.MinValue
      val uAsDouble = (u >>> 1).toDouble * 2.0 + (u & 1L).toDouble
      val hk = uAsDouble / math.pow(2.0, 64)
      (k - 1).toDouble / hk
    }

  override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** Typed column usable in df.agg(...) over a long column. */
  def apply(k: Int = 256): TypedColumn[Long, Double] = new KmvDistinct(k).toColumn
}
