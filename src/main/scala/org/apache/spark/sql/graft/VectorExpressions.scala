package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Column ⇄ Expression bridge for Spark 4's backend-agnostic `Column`.
  *
  * The single internals-touching shim of the engine (the reference keeps an
  * analogous one for dense ids — SparkExtensions.scala:26-55); everything
  * else is public DataFrame API.
  */
object NativeColumn {
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
}

/** Single-pass cosine similarity over two `array<double>` columns, with
  * whole-stage codegen.
  *
  * Why a native expression: `zip_with`/`aggregate` higher-order functions are
  * interpreted row-at-a-time (each element evaluation walks a lambda
  * expression tree) and break the surrounding WholeStageCodegen span. This
  * expression compiles to a tight primitive-double loop — the difference
  * between an ANN scan being memory-bound and lambda-interpreter-bound at
  * 100 TB. Arithmetic order matches the HOF formulation exactly
  * (sequential fold of products, then `dot / (sqrt(nx) * sqrt(ny))`), so
  * results are bit-identical to [[graft.ops.VectorOps.cosine]]'s reference
  * semantics.
  *
  * Null semantics: null array → null result; null *elements* are not
  * supported (embedding vectors are dense by contract).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x[$i] * $y[$i]; $nx += $x[$i] * $x[$i]; $ny += $y[$i] * $y[$i];
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-pass dot product over two `array<double>` columns (codegen). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x(i) * y(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $x[$i] * $y[$i]; }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    NativeColumn.toColumn(CosineSimilarity(NativeColumn.toExpr(a), NativeColumn.toExpr(b)))
  def dotProduct(a: Column, b: Column): Column =
    NativeColumn.toColumn(DotProduct(NativeColumn.toExpr(a), NativeColumn.toExpr(b)))
}
