package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two FLOAT[] vectors,
  * accumulated in DOUBLE, left-to-right — numerically identical to the
  * `aggregate(zip_with(...))` higher-order form it replaces (and to the
  * DuckDB oracle's `list_inner_product` over DOUBLE[]), but ~an order of
  * magnitude cheaper per row: the HOF form allocates three intermediate
  * ArrayData per pair and interprets two lambdas per element; this is a
  * single fused loop that whole-stage codegen inlines into the join
  * stage. This is the hot inner loop of every ANN query (corpus ×
  * probes), exactly the place SURVEY §7.3 reserves for a custom
  * `Expression`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Each side may be FLOAT[] or DOUBLE[] independently (floats upcast to
  // double per element, same as the HOF/oracle forms): the corpus is
  // float in parquet, but derived vectors — k-means centroids (a8),
  // normalized embeddings — are double.
  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  // NULL when lengths differ or any element is null (matching the
  // null-propagation of the zip_with higher-order form) and when either
  // norm is zero (0/0: DuckDB yields NULL there, and NaN would sort
  // ABOVE every real similarity under descending order, poisoning
  // top-k).
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val leftIsFloat = elemType(left.dataType).contains(FloatType)
    val rightIsFloat = elemType(right.dataType).contains(FloatType)
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // emit the per-element null branch only when either input's
      // static type admits null elements — the embeddings hot path
      // (containsNull=false both sides) keeps the tight loop
      val mayHaveNullElems = Seq(left.dataType, right.dataType).exists {
        case ArrayType(_, cn) => cn
        case _ => true
      }
      val elemNullCheck =
        if (mayHaveNullElems)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) {
                ${ev.isNull} = true; break;
              }"""
        else ""
      def get(v: String, side: DataType): String =
        if (elemType(side).contains(FloatType)) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      s"""
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $elemNullCheck
            double $xv = ${get(x, left.dataType)};
            double $yv = ${get(y, right.dataType)};
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          if (!${ev.isNull}) {
            if ($na == 0.0 || $nb == 0.0) {
              ${ev.isNull} = true;
            } else {
              ${ev.value} = $dot / (java.lang.Math.sqrt($na) *
                                    java.lang.Math.sqrt($nb));
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** FunctionRegistry entry, injected by [[graft.GraftExtensions]];
    * usable from SQL / expr() as `cosine_sim(a, b)`. */
  val description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(exprs(0), exprs(1))
    })
}
