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
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product"       -> (es => DotProduct(es(0), es(1)))
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    Seq(
      "cosine_similarity" -> ((es: Seq[Expression]) => CosineSimilarity(es(0), es(1)): Expression),
      "dot_product"       -> ((es: Seq[Expression]) => DotProduct(es(0), es(1)): Expression)
    ).foreach { case (name, b) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[CosineSimilarity].getName, name),
          b))
    }
}
