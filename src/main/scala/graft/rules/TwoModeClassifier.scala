package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exception raised when a configured recipe has no fixed vertex in the CSV.
  * Ref: common/.../models/GrafinkException.scala (MissingFixedVertex).
  */
final case class MissingFixedVertex(msg: String) extends Exception(msg)

/** A typed property of a fixed (dimension) vertex.
  * Ref: common/.../models/FixedVertex* (FixedVertexProperty).
  */
case class FixedVertexProperty(name: String, propType: String, value: Any)

/** A pre-created dimension vertex with id below the reserved id space.
  * Ref: common/.../models/FixedVertex.
  */
case class FixedVertex(id: Long, label: String, properties: List[FixedVertexProperty])

/** Configuration for [[TwoModeClassifier]].
  * Ref: common/.../models/Config.scala (TwoModeSimilarityConfig).
  */
case class TwoModeSimilarityConfig(recipes: List[String])

/** Connects alert vertices to *fixed* recipe vertices (a two-mode / bipartite
  * graph): each configured recipe is either a row predicate ("direct" rule:
  * supernova / microlensing / asteroids) or a value→vertex exact-match rule
  * ("catalog" over `cdsxmatch`).
  *
  * Ref: core/.../processor/edgerules/TwoModeClassifier.scala:42-144.
  *
  * Spark-first re-expression: where the reference runs a typed `flatMap` with
  * closure-captured maps (row-at-a-time, Kryo/Encoder ser-deser, opaque to
  * Catalyst), we compile every recipe to a Catalyst `Column`:
  * {{{
  *   select(id, explode(array(when(pred_i, lit(fixedId_i)), ...,
  *                            catalogMap[cdsxmatch])) as dst)
  *     .where(dst.isNotNull)
  * }}}
  * One pruned scan, zero shuffles, whole-stage codegen end-to-end; the
  * catalog lookup is a literal-map `element_at` (null when absent), matching
  * the reference's `Map.contains` gate. At 100 TB this is a pure map-side
  * operator.
  */
class TwoModeClassifier(config: TwoModeSimilarityConfig, similarityRecipes: List[FixedVertex])
    extends VertexClassifierRule {

  // Quirk preserved from the reference (TwoModeClassifier.scala:36).
  override def name: String = "similarityClassifier"
  override def getEdgeLabel: String = "satr"
  override def getEdgePropertyKey: String = "weight"

  /** 19-element SIMBAD class set of the new supernova recipe.
    * Ref: TwoModeClassifier.scala:46-68.
    */
  val supernovaRecipeCdsxmatchSet: Seq[String] = Seq(
    "galaxy", "Galaxy", "EmG", "Seyfert", "Seyfert_1", "Seyfert_2",
    "BlueCompG", "StarburstG", "LSB_G", "HII_G", "High_z_G", "GinPair",
    "GinGroup", "BClG", "GinCl", "PartofG", "Unknown", "Candidate_SN*",
    "SN", "Transient"
  )

  /** Direct-rule predicates as Catalyst columns.
    * Ref: TwoModeClassifier.scala:29-34 (old recipes), :70-77 (supernova).
    */
  val ruleToCondition: Map[String, Column] = Map(
    "supernova" -> (col("snn_snia_vs_nonia") > 0.75 &&
      col("snn_sn_vs_all") > 0.75 &&
      col("drb") > 0.5 &&
      col("ndethist") < 400 &&
      col("classtar") > 0.4f &&
      col("cdsxmatch").isin(supernovaRecipeCdsxmatchSet: _*)),
    "microlensing" -> (col("mulens_class_1") === "ML" && col("mulens_class_2") === "ML"),
    "asteroids"    -> (col("roid") > 1)
  )

  /** Column each exact-match rule matches against. Ref: TwoModeClassifier.scala:86. */
  val ruleToColumnName: Map[String, String] = Map("catalog" -> "cdsxmatch")

  override def classify(loadedDf: DataFrame, df: DataFrame): DataFrame = {
    val rules           = config.recipes
    val directRules     = rules.filter(ruleToCondition.contains)
    val exactMatchRules = rules.filterNot(ruleToCondition.contains)

    def recipesForRule(rule: String): List[FixedVertex] =
      similarityRecipes.filter(_.properties.exists(_.value.toString == rule))

    // Direct rules → fixed vertex id (first matching recipe wins, as in the
    // reference's recipe.head — TwoModeClassifier.scala:93-99).
    val ruleToId: Map[String, Long] = directRules.map { rule =>
      val recipe = recipesForRule(rule)
      if (recipe.isEmpty)
        throw MissingFixedVertex(s"No fixed vertex found in csv for configured rule $rule")
      rule -> recipe.head.id
    }.toMap

    // Exact-match rules → value→id map (every recipe row must carry an
    // `equals` property — TwoModeClassifier.scala:107-125).
    val exactMatchRuleToId: Map[String, Map[String, Long]] = exactMatchRules.map { rule =>
      val recipe = recipesForRule(rule)
      if (recipe.isEmpty)
        throw MissingFixedVertex(s"No fixed vertex found in csv for configured rule $rule")
      rule -> recipe.map { r =>
        val vProp = r.properties.find(_.name == "equals")
        if (vProp.isEmpty)
          throw new IllegalArgumentException(
            s"entry $r must have property equals since it is exact match recipe (rule $rule)"
          )
        vProp.get.value.toString -> r.id
      }.toMap
    }.toMap

    // Each recipe contributes one nullable dst expression; explode + non-null
    // filter yields 0..n edges per row in a single codegen stage.
    val directDsts: List[Column] = directRules.map { rule =>
      when(ruleToCondition(rule), lit(ruleToId(rule))).otherwise(lit(null).cast("long"))
    }
    val exactDsts: List[Column] = exactMatchRules.map { rule =>
      val lookup = exactMatchRuleToId(rule)
      val mapCol = typedLit(lookup)
      element_at(mapCol, col(ruleToColumnName(rule)))
    }
    val dsts = directDsts ++ exactDsts
    require(dsts.nonEmpty, "TwoModeClassifier requires at least one recipe")

    df.select(col("id").as(EdgeColumns.Src), explode(array(dsts: _*)).as(EdgeColumns.Dst))
      .where(col(EdgeColumns.Dst).isNotNull)
      .withColumn(EdgeColumns.PropVal, lit(0.0))
  }
}
