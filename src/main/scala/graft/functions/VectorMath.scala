package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector arithmetic over `array<float|double>` embedding columns,
  * built entirely from codegen'd higher-order built-ins (`zip_with`,
  * `aggregate`, `transform`) — no UDFs, so expressions stay inside
  * whole-stage codegen and scale with the scan.
  *
  * Floats are upcast to double before accumulating (exact) and both
  * engines then accumulate element-wise left-to-right, keeping results
  * comparable with DuckDB's `list_cosine_similarity` after rounding.
  */
object VectorMath {

  private def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** ‖v‖₂ */
  def norm(v: Column): Column =
    sqrt(aggregate(transform(asDouble(v), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** cos(a, b) = a·b / (‖a‖‖b‖) — a native codegen'd expression
    * ([[CosineSimilarityExpr]]); bit-identical to the HOF
    * formulation `dot(a, b) / (norm(a) * norm(b))` but one fused
    * allocation-free loop, which matters when LSH verification calls
    * it per candidate pair. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(CosineSimilarityExpr(expression(a), expression(b)))
  }

  /** element-wise sum — building block for averaging/centroids */
  def add(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  /** v / scalar */
  def scale(v: Column, divisor: Column): Column =
    transform(asDouble(v), x => x / divisor)
}
