package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's skew
  * handling isn't available (e.g. pinned plans, or skew in the BUILD side
  * of a shuffle join at 100 TB).
  *
  * The skewed (large, hot-keyed) side gets a random-ish salt in [0, n);
  * the other side is replicated n times, one row per salt value. The join
  * key becomes (key, salt), spreading each hot key over n reducers. The
  * salt is derived deterministically from a unique row-id column so results
  * are reproducible (no rand(), which would break retry determinism —
  * a failed task would re-roll different salts).
  */
object SkewJoin {

  /** Inner equi-join of `skewed` with `other` on `key`, with `salts`-way
    * fanout of the hot keys. `rowId` must be a unique column of `skewed`.
    */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
      rowId: String, salts: Int): DataFrame = {
    val saltCol = pmod(xxhash64(col(rowId)), lit(salts)).cast("int")
    val left = skewed.withColumn("_salt", saltCol)
    val right = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    left.join(right, Seq(key, "_salt")).drop("_salt")
  }
}
