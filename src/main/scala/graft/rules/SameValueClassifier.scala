package graft.rules

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Configuration for [[SameValueClassifier]].
  * Ref: common/.../models/Config.scala (SameValueSimilarityConfig).
  *
  * @param maxGroupSize optional skew guard: value-groups larger than this
  *        emit no intra-batch clique (their pair count is quadratic — one
  *        hot key can dominate the job). `None` = exact reference
  *        semantics. Capped workloads wanting linear output should use
  *        [[graft.ops.Dedup.exact]] (star topology) instead.
  */
case class SameValueSimilarityConfig(
    colsToConnect: List[String],
    maxGroupSize: Option[Int] = None)

/** Edge row for the same-value rule: propVal = the matched column's name.
  * Ref: SameValueClassifier.scala:29.
  */
case class SameValueEdge(src: Long, dst: Long, propVal: String)

/** Connects vertices sharing the same value of one or more columns.
  *
  * Ref: core/.../processor/edgerules/SameValueClassifier.scala:39-63.
  * Two edge sources per column, unioned across columns:
  *  1. intra-batch cliques: all unordered pairs of new vertices with the same
  *     column value (`combinations(2)` per group);
  *  2. new×loaded equi-join on the column.
  *
  * Scale notes: the intra-batch clique is a `groupByKey.flatMapGroups` — one
  * shuffle on the column value, matching the reference. Per-group output is
  * quadratic in group size by *semantics* (a clique), so for 100 TB inputs
  * the operator's cost is dominated by the largest value-group; AQE skew
  * handling does not apply inside flatMapGroups, so heavily skewed dedup-type
  * workloads should prefer [[graft.ops.Dedup]] (star topology: min-id
  * representative per group, linear output). The new×loaded side is a plain
  * equi-join: hash/sort-merge, broadcast when loaded is small.
  */
class SameValueClassifier(config: SameValueSimilarityConfig) extends VertexClassifierRule {

  // Quirk preserved from the reference (SameValueClassifier.scala:33).
  override def name: String = "similarityClassifier"
  override def getEdgeLabel: String = "exactmatch"
  override def getEdgePropertyKey: String = "propertyname"

  override def classify(loadedDf: DataFrame, df: DataFrame): DataFrame = {
    implicit val ec: Encoder[SameValueEdge] = Encoders.product[SameValueEdge]

    config.colsToConnect.map { column =>
      val newVertices = df.select(column, "id")

      // (1) clique edges within the current batch. The grouping key is the
      // column value canonicalized to a string (type-agnostic: int/long/
      // decimal link columns work without a caller-side cast); null keeps
      // its own group, distinct from the literal string "null". Signed
      // float/double zeros are normalized to 0.0 so intra-batch grouping
      // agrees with the cross-batch join below, where Spark's equality
      // treats -0.0 = 0.0 as true ("-0.0".toString would split the group).
      // NaN needs no special case: its single string form groups together,
      // matching Spark's NaN = NaN join semantics.
      val cap    = config.maxGroupSize
      val keyIdx = newVertices.schema.fieldIndex(column)
      val edgesFromNewVertices = newVertices
        .groupByKey { r =>
          if (r.isNullAt(keyIdx)) null
          else r.get(keyIdx) match {
            case d: java.lang.Double if d.doubleValue() == 0.0 => "0.0"
            case f: java.lang.Float if f.floatValue() == 0.0f  => "0.0"
            case v                                             => v.toString
          }
        }(Encoders.STRING)
        .flatMapGroups { (_, rows) =>
          val ids = rows.map(_.getAs[Long]("id")).toList
          if (cap.exists(ids.size > _)) Iterator.empty
          else ids.combinations(2).map(l => SameValueEdge(l(0), l(1), column))
        }
        .toDF()

      // (2) new×loaded equi-join on the column value. Explicit aliases keep
      // the join unambiguous even when both sides derive from the same
      // DataFrame (the reference always had disk-loaded vs current-batch
      // frames; we also support same-lineage splits).
      newVertices.as("n")
        .join(loadedDf.select(column, "id").as("l"), col(s"n.$column") === col(s"l.$column"))
        .select(
          col("n.id").as(EdgeColumns.Src),
          col("l.id").as(EdgeColumns.Dst),
          lit(column).as(EdgeColumns.PropVal)
        )
        .union(edgesFromNewVertices)
    }.reduce(_ union _)
  }
}
