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

  /** Scale a numeric column to a 16-bit bucket given its [min, max] range
    * (carried in `minC`/`maxC` columns from a broadcast stats row).
    * Degenerate ranges (min == max) map to bucket 0.
    */
  private def bucket16(v: Column, minC: Column, maxC: Column): Column =
    when(maxC === minC, lit(0L)).otherwise(
      least(lit(65535L),
        floor((v - minC).cast("double") / (maxC - minC).cast("double") * 65536.0)
          .cast("long")))

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
}
