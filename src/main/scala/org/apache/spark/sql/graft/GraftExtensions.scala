package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration of the native vector expressions, so `spark.sql` users
  * get them as first-class functions:
  * {{{
  *   SELECT vec_id FROM embeddings
  *   ORDER BY cosine_similarity(embedding, array(...)) DESC LIMIT 10
  * }}}
  *
  * Two deployment paths:
  *  - [[GraftFunctions.register]] on a live session (temp functions);
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at build time (cluster-wide, survives new sessions).
  */
object GraftFunctions {

  /** k (and any sketch-size argument) must be a literal in SQL — it sizes
    * the aggregation buffer at plan time.
    */
  private def foldInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name expects a literal integer, got $e")
    e.eval().asInstanceOf[Number].intValue
  }

  // Aggregate functions are returned bare: the analyzer wraps an
  // AggregateFunction into its AggregateExpression during resolution,
  // exactly as for the built-in registry entries.
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product"       -> (es => DotProduct(es(0), es(1))),
    "jaro_winkler"      -> (es => JaroWinkler(es(0), es(1))),
    "nfc_normalize"     -> (es => NfcNormalize(es(0))),
    "deflate_ratio"     -> (es => DeflateRatio(es(0))),
    "simhash_agg"       -> (es => SimHashAgg(es(0))),
    "topk_agg"          -> (es => TopKAgg(es(0), es(1), foldInt(es(2), "topk_agg"))),
    "countmin_agg"      -> (es =>
      CountMinAgg(es(0), foldInt(es(1), "countmin_agg"), foldInt(es(2), "countmin_agg")))
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[CosineSimilarity].getName, name),
          b))
    }
}
