package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro-Winkler algorithm body, shared by the interpreted and the
  * generated path (the generated code calls this static method — the same
  * structure Spark's own `levenshtein` uses, so the expression stays inside
  * the WholeStageCodegen span with one static call per row instead of a
  * lambda-interpreter detour).
  *
  * Semantics pinned to the textbook definition (and cross-checked constant
  * by constant against DuckDB's `jaro_winkler_similarity`, which the driver
  * oracle evaluates): match window `max(|a|,|b|)/2 − 1`, transpositions
  * counted over matched sequences, Winkler boost `p = 0.1` over at most 4
  * common prefix characters applied when jaro > 0.7, and — deliberately
  * matching DuckDB rather than some references — EITHER input empty scores
  * 0.0 (including empty vs empty). Operates on UTF-16 chars: correct for
  * the Basic Multilingual Plane; astral pairs compare surrogate-wise, the
  * standard JVM-string behavior.
  */
object JaroWinklerAlgo {
  def compute(left: UTF8String, right: UTF8String): Double = {
    val a = left.toString
    val b = right.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, lb)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var prefix = 0
      val pmax = math.min(4, math.min(la, lb))
      while (prefix < pmax && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Jaro-Winkler similarity of two string columns in [0, 1] — the
  * finer-grained re-scoring similarity of entity resolution (typo-tolerant
  * name matching), complementing [[graft.ops.FuzzyJoin]]'s exact
  * edit-distance blocking: block cheap and exact on deletion variants,
  * re-score candidates with Jaro-Winkler. Codegen end to end; null-safe
  * (null input → null result).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerAlgo.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    NativeColumn.toColumn(JaroWinkler(NativeColumn.toExpr(a), NativeColumn.toExpr(b)))
}
