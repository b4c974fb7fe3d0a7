package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Contract columns for every edge set produced by a classifier rule.
  * Ref: core/.../processor/EdgeProcessor.scala:41-46 (EdgeColumns).
  */
object EdgeColumns {
  val Src: String     = "src"
  val Dst: String     = "dst"
  val PropVal: String = "propVal"
  val all: Seq[String] = Seq(Src, Dst, PropVal)
}

/** A pluggable edge-generation rule.
  *
  * Given the already-loaded vertex table (`loadedDf`) and the current batch
  * (`df`, id-stamped), produces a DataFrame of edges with columns
  * `src: Long, dst: Long, propVal: <rule-specific>` where `src` is always an
  * id from the current batch.
  *
  * Ref: core/.../processor/edgerules/VertexClassifierRule.scala:21-39.
  * Note the propVal type varies per rule (Int / Double / String) — a known
  * schema-variance wart in the reference (EdgeProcessor.scala:90-93) that we
  * keep, validating shape with [[VertexClassifierRule.validate]] instead of
  * spark-daria.
  */
trait VertexClassifierRule {
  def name: String
  def getEdgeLabel: String
  def getEdgePropertyKey: String
  def classify(loadedDf: DataFrame, df: DataFrame): DataFrame
}

object VertexClassifierRule {

  /** Validates the rule output contract: `src`, `dst`, `propVal` present. */
  def validate(schema: StructType, ruleName: String): Unit = {
    val missing = EdgeColumns.all.filterNot(schema.fieldNames.contains)
    require(
      missing.isEmpty,
      s"Edge DataFrame from rule '$ruleName' is missing contract columns: ${missing.mkString(", ")}"
    )
  }
}
