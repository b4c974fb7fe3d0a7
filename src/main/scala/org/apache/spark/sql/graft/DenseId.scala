package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Dense, contiguous id assignment as a first-class operator:
  * logical node → planner strategy → physical node over `InternalRow`s.
  *
  * This is the reference's one internals-touching utility
  * (core/src/main/scala/org/apache/spark/sql/SparkExtensions.scala:36-55 —
  * `queryExecution.toRdd.zipWithIndex` + `LogicalRDD`, explicitly to skip
  * the Row⇄InternalRow ser/deser round trip), re-expressed the Spark-4 way:
  * instead of rebuilding a DataFrame around an RDD, the operator stays a
  * plan node, so Catalyst sees it (column pruning flows through `child`)
  * and downstream operators consume its UnsafeRows directly.
  *
  * Cost model: `RDD.zipWithIndex` = one lightweight count-per-partition job
  * + one fully parallel map with per-partition offsets — no shuffle, no
  * single-partition window, which is what lets it run at 100 TB.
  * [[graft.ids.ZipWithIndex]] is the public-API equivalent (one extra
  * Row⇄InternalRow round trip), kept as the semantic contract and used by
  * the specs to cross-check this operator.
  */
case class DenseIdPlan(child: LogicalPlan, offset: Long, idAttr: Attribute)
    extends UnaryNode {
  // idAttr lives in the constructor so Catalyst's node copies (e.g. in
  // withNewChildInternal during optimization) keep the same exprId —
  // regenerating it per copy breaks attribute binding upstream.
  override def output: Seq[Attribute] = idAttr +: child.output
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(idAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): DenseIdPlan =
    copy(child = newChild)
}

case class DenseIdExec(child: SparkPlan, offset: Long, output: Seq[Attribute])
    extends UnaryExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    val out = output
    val off = offset
    child.execute().zipWithIndex().mapPartitionsInternal { iter =>
      val idRow  = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      val proj   = UnsafeProjection.create(out, out)
      iter.map { case (row, idx) =>
        idRow.setLong(0, off + idx + 1)
        proj(joined(idRow, row))
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): DenseIdExec =
    copy(child = newChild)
}

object DenseIdStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: DenseIdPlan =>
      DenseIdExec(planLater(p.child), p.offset, p.output) :: Nil
    case _ => Nil
  }
}

/** Public entry: replaces/creates `idName` with `offset+1, offset+2, ...`
  * in partition-then-row order (dense and contiguous by construction).
  */
object DenseId {
  def assign(df: DataFrame, offset: Long = 0, idName: String = "id"): DataFrame = {
    val spark = df.sparkSession
    registerOnce(spark)
    val dropped = df.drop(idName)
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      DenseIdPlan(dropped.queryExecution.analyzed, offset,
        AttributeReference(idName, LongType, nullable = false)()))
  }

  private def registerOnce(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.sessionState.planner.extraPlanningStrategies.contains(DenseIdStrategy))
      ss.experimental.extraStrategies = DenseIdStrategy +: ss.experimental.extraStrategies.filterNot(_ == DenseIdStrategy)
  }
}
