package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns as native Column combinators.
  *
  * Everything here stays inside Catalyst (higher-order functions, no UDFs),
  * so plans remain optimizable and distributable: at 100 TB these expressions
  * run per-row inside the scan/project stage with zero extra shuffles.
  *
  * All math is done in DOUBLE regardless of input element type: float inputs
  * are exactly representable in double, and a left-to-right double fold is
  * deterministic across engines — required for oracle hash-parity.
  */
object VectorFunctions {

  /** Cast an array column's elements to double. */
  def toDoubleArray(a: Column): Column = transform(a, _.cast("double"))

  /** Left-fold dot product: aggregate(zip_with(a,b,*), 0.0, +). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0), (s, x) => s + x)

  /** Sum of squares (left fold, double). */
  def sumSq(a: Column): Column =
    aggregate(toDoubleArray(a), lit(0.0), (s, x) => s + x * x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(sumSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)
}
