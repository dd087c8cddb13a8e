package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning at scale.
  *
  * Why it matters at 100 TB: parquet readers skip row groups whose min/max
  * stats exclude the filter range. A table range-partitioned on ONE column
  * prunes only filters on that column; interleaving the bits of TWO rank
  * dimensions makes files cover small rectangles of the (a, b) space, so
  * selective filters on EITHER column skip most files. This is the layout
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here as a plain
  * repartitionByRange + sortWithinPartitions over a computed z-value, with
  * the bit interleave built entirely from codegen'd bitwise functions
  * (shiftleft/or/and): no UDF, no custom expression needed.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i — the
    * classic mask ladder (public-domain "Interleave bits by Binary Magic
    * Numbers" construction), expressed over Columns so it codegens.
    */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit bucket columns (a in even bits, b in
    * odd bits). Inputs must already be in [0, 65535].
    */
  def zValue(aBucket: Column, bBucket: Column): Column =
    spread16(aBucket.cast("long"))
      .bitwiseOR(shiftleft(spread16(bBucket.cast("long")), 1))

  /** Scale a numeric column to a `bits`-bit bucket given its [min, max]
    * range (carried in `minC`/`maxC` columns from a broadcast stats row).
    * Degenerate ranges (min == max) map to bucket 0.
    */
  private def bucketBits(v: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val buckets = 1L << bits
    when(maxC === minC, lit(0L)).otherwise(
      least(lit(buckets - 1),
        floor((v - minC).cast("double") / (maxC - minC).cast("double") * buckets.toDouble)
          .cast("long")))
  }

  private def bucket16(v: Column, minC: Column, maxC: Column): Column =
    bucketBits(v, minC, maxC, 16)

  /** Bits per dimension for an N-column interleave: 16 as in the 2-dim
    * ladder while it fits, fewer for wide interleaves so the z value
    * stays a positive long (4 dims → 15 bits, 8 dims → 7).
    */
  def bitsPerDim(n: Int): Int = math.min(16, 62 / n)

  /** Morton interleave of N bucket columns — bit b of dimension i lands
    * at position b·N + i, so the curve cycles dimensions evenly and a
    * range-partition on z pins high bits of EVERY dimension. Built from
    * codegen'd bitwise functions like [[zValue]] (N·bits shift/and/or
    * column ops — a wide but flat, fully codegen'd expression); the
    * 2-dim magic-number ladder remains the specialized fast path.
    * Inputs must already be in [0, 2^bitsPerDim).
    */
  def zValueN(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 2, s"zValueN needs >= 2 dimensions, got $n")
    require(bits >= 1 && bits * n <= 62, s"$n dims x $bits bits overflow a long")
    buckets.zipWithIndex.map { case (x, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Return `df` clustered on the z-order of (`colA`, `colB`) in `files`
    * range partitions, each sorted by z. Write the result with any sink;
    * every output file then covers a compact rectangle of the (a, b)
    * space, so min/max stats prune scans filtered on either column.
    *
    * One extra pass computes global min/max (a 1-row broadcast — the same
    * scalar-rides-along shape as q42's N); the clustering itself is one
    * range shuffle, exactly what a sort-on-one-column layout costs.
    */
  def zorder(df: DataFrame, colA: String, colB: String, files: Int): DataFrame = {
    val stats = df.agg(
      min(col(colA)).as("za_min"), max(col(colA)).as("za_max"),
      min(col(colB)).as("zb_min"), max(col(colB)).as("zb_max"))
    df.crossJoin(broadcast(stats))
      .withColumn("z", zValue(
        bucket16(col(colA), col("za_min"), col("za_max")),
        bucket16(col(colB), col("zb_min"), col("zb_max"))))
      .drop("za_min", "za_max", "zb_min", "zb_max")
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }

  /** [[zorder]] generalized to N columns (r15 verdict item 7): one stats
    * pass (a 1-row broadcast of per-column min/max), one range shuffle on
    * the interleaved z — identical cost shape to the 2-column form, so
    * layout tuning can cluster on however many filter dimensions the
    * query family actually uses. Per-dimension resolution shrinks as N
    * grows ([[bitsPerDim]]); past ~6 dims the curve's locality is mostly
    * gone — that is inherent to space-filling curves, not this encoding.
    */
  def zorderN(df: DataFrame, cols: Seq[String], files: Int): DataFrame = {
    require(cols.size >= 2, s"zorderN needs >= 2 columns, got ${cols.size}")
    val bits = bitsPerDim(cols.size)
    val statAggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"zmin_$c"), max(col(c)).as(s"zmax_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val buckets = cols.map(c =>
      bucketBits(col(c), col(s"zmin_$c"), col(s"zmax_$c"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("z", zValueN(buckets, bits))
      .drop(cols.flatMap(c => Seq(s"zmin_$c", s"zmax_$c")): _*)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }
}
