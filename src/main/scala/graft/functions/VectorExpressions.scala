package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two `array<float|double>` columns.
  *
  * Replaces the higher-order-function formulation (`aggregate` over
  * `zip_with`): Spark's array HOFs evaluate their lambda interpreted,
  * per element, with an intermediate array allocation per step — fine
  * for a few thousand rows, a measured bottleneck once LSH candidate
  * verification evaluates the similarity hundreds of thousands of
  * times. This expression is one fused JVM loop (no allocations) and
  * generates code through the same reference-object pattern as the
  * sketch expressions, keeping the surrounding stage in whole-stage
  * codegen.
  *
  * Arithmetic is kept BIT-IDENTICAL to the HOF version (and so to the
  * DuckDB oracle replays proven by x6/x7/x23): floats upcast to
  * double exactly, sequential left-to-right folds for the dot product
  * and each norm, final `dot / (sqrt(na) * sqrt(nb))` with no
  * epsilon special-casing. Mismatched lengths and null elements
  * return null, exactly as null-padded `zip_with` products propagate.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // fail at ANALYSIS time for wrong argument types — without this,
  // the lazy element-type probe would surface as a task-time
  // IllegalArgumentException deep in an executor stack
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity needs array<float|double> arguments, got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"cosine_similarity needs array<float|double>, got $other")
  }
  private lazy val leftFloat = elemFloat(left)
  private lazy val rightFloat = elemFloat(right)

  def compute(aRaw: Any, bRaw: Any): Any = {
    val a = aRaw.asInstanceOf[ArrayData]
    val b = bRaw.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cosSim", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (aVar, bVar) =>
      s"""java.lang.Double ${ev.value}_r = (java.lang.Double) $refName.compute($aVar, $bVar);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
