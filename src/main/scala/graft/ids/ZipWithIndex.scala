package graft.ids

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense, monotonically-contiguous id assignment starting at `offset + 1`.
  *
  * Ref: core/src/main/scala/org/apache/spark/sql/SparkExtensions.scala:36-55,
  * used by IDManagerSparkService.scala:85-86. The reference drops into Spark
  * internals (`queryExecution.toRdd` + `LogicalRDD`) to skip a Row⇄InternalRow
  * round trip; on Spark 4 the equivalent public-API route is
  * `rdd.zipWithIndex` + `createDataFrame(rdd, schema)`.
  *
  * Why not built-ins: `monotonically_increasing_id()` is non-dense (gaps
  * between partitions) and `row_number().over(Window.orderBy(...))` collapses
  * to a single partition. `RDD.zipWithIndex` is the scalable primitive: one
  * lightweight count-per-partition job, then a fully parallel map that adds
  * per-partition offsets — no shuffle, no single-partition bottleneck, which
  * is what lets this run on a 100 TB input where a global window would not.
  */
object ZipWithIndex {

  /** Replaces/creates column `id` with values `offset+1, offset+2, ...` in
    * partition-then-row order. Dense and contiguous by construction.
    */
  def zipWithIndex(df: DataFrame, offset: Long = 0, colName: String = "id"): DataFrame = {
    val spark  = df.sparkSession
    val input  = df.drop(col(colName))
    val schema = StructType(StructField(colName, LongType, nullable = false) +: input.schema.fields)
    val rows = input.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq((offset + idx + 1) +: row.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
