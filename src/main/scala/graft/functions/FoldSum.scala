package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Ordered left-fold sum over an array — the native replacement for
  * the repo's ubiquitous interpreted HOF fold
  * `aggregate(arr, lit(0.0), (acc, x) => acc + x)` (plain numeric
  * arrays) and
  * `aggregate(arr, lit(0.0), (acc, s) => acc + s.getField(f))`
  * (arrays of structs — [[graft.ops.Classifier.sortedFold]] and the
  * inline keyed folds). The HOF path pays a lambda dispatch and a
  * boxed accumulator per element (~66 µs/element, the r16
  * measurement class); this is one tight JVM loop staying inside
  * whole-stage codegen via the direct-call pattern of
  * [[CdcBoundaries]] / [[CharEntropy]].
  *
  * Bit-identical to the HOF by construction:
  *   - iteration order is array order — the caller supplies the
  *     `sort_array(collect_list(...))` exactly as before, so the
  *     addition chain `0.0 + v₀ + v₁ + …` is the same IEEE sequence;
  *   - numeric widening matches the Cast the HOF's `+` inserts
  *     (int/long/float `.toDouble` — the identical JVM conversions);
  *   - null algebra matches `acc + NULL = NULL` being sticky: a NULL
  *     element or NULL field value makes the whole result NULL (the
  *     HOF's accumulator goes NULL and never recovers) — implemented
  *     as an early NULL return, observationally identical;
  *   - empty array → the 0.0 zero element, NULL array → NULL.
  *
  * `field = None` sums the (numeric) elements themselves; `field =
  * Some(name)` sums that struct field. FoldSumSpec pins native == HOF
  * bit-exact on fixtures and corpus-derived frames.
  */
case class FoldSum(child: Expression, field: Option[String] = None)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fold_sum"

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  // (field ordinal, field type, struct width) when folding a struct
  // field; None for plain numeric elements
  private lazy val structSpec: Option[(Int, DataType, Int)] = field.map { f =>
    val st = elemType.asInstanceOf[StructType]
    (st.fieldIndex(f), st(st.fieldIndex(f)).dataType, st.size)
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(et, _) => (field, et) match {
        case (Some(f), st: StructType) =>
          if (!st.fieldNames.contains(f))
            TypeCheckFailure(s"struct has no field '$f': $st")
          else st(f).dataType match {
            case DoubleType | FloatType | IntegerType | LongType =>
              TypeCheckSuccess
            case other =>
              TypeCheckFailure(s"unsupported fold field type $other")
          }
        case (None, DoubleType | FloatType | IntegerType | LongType) =>
          TypeCheckSuccess
        case other => TypeCheckFailure(s"unsupported fold input $other")
      }
      case other =>
        TypeCheckFailure(s"fold_sum needs an array, got $other")
    }
  }

  def compute(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    structSpec match {
      case Some((idx, ft, width)) =>
        while (i < n) {
          if (arr.isNullAt(i)) return null
          val row = arr.getStruct(i, width)
          if (row.isNullAt(idx)) return null
          acc = acc + (ft match {
            case DoubleType => row.getDouble(idx)
            case FloatType => row.getFloat(idx).toDouble
            case IntegerType => row.getInt(idx).toDouble
            case LongType => row.getLong(idx).toDouble
            case other => throw new IllegalStateException(other.toString)
          })
          i += 1
        }
      case None =>
        while (i < n) {
          if (arr.isNullAt(i)) return null
          acc = acc + (elemType match {
            case DoubleType => arr.getDouble(i)
            case FloatType => arr.getFloat(i).toDouble
            case IntegerType => arr.getInt(i).toDouble
            case LongType => arr.getLong(i).toDouble
            case other => throw new IllegalStateException(other.toString)
          })
          i += 1
        }
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("foldSum", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar => {
      val boxed = ctx.freshName("foldSumRes")
      s"""java.lang.Double $boxed = $refName.compute($childVar);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
