package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the most recent right row
  * with the same key and `time <= left.time` (inclusive).
  *
  * The classic time-series primitive Spark lacks natively. Naive encodings
  * are scale-killers: a theta-join on `r.time <= l.time` plans a
  * BroadcastNestedLoopJoin (quadratic per key), and a per-key
  * `collect_list + binary search` UDF breaks codegen and blows memory on hot
  * keys. This implementation is the union-scan shape:
  *
  *   1. tag both sides and union them (right rows carry their payload,
  *      left rows a null payload);
  *   2. one hash shuffle on the key, sort within partitions by
  *      (time, side, payload);
  *   3. running `last(payload, ignoreNulls)` over the sorted stream gives
  *      each left row the latest right payload at-or-before it;
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle of |left| + |right| rows — identical asymptotics to a
  * plain equi-join on the key, no matter how skewed the time distribution.
  * Window state is a single struct per partition stream (running last), so
  * memory is O(1) per task.
  *
  * Determinism: right rows sharing (key, time) are ordered by payload struct
  * (time first, then `rightCols` in order), so the LARGEST payload wins ties
  * — e.g. with `rightCols = Seq("event_id")`, the highest event id at the
  * tied timestamp. Left rows sort after right rows at the same time
  * (side 1 > side 0), which is what makes the join inclusive.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "matched_"
  ): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one right-side column to attach")
    val leftCols = left.columns.toSeq

    // payload = (time, rightCols...): carries both the matched values and
    // the deterministic tie order (distinct: rightCols may list the time
    // column itself to re-expose it in the output)
    val payload = struct((timeCol +: rightCols).distinct.map(c => col(c).as(c)): _*)

    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(col(timeCol).as("_asof_time"), lit(0).as("_asof_side"),
        payload.as("_asof_payload"), lit(null).cast(left.schema).as("_asof_row")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(col(timeCol).as("_asof_time"), lit(1).as("_asof_side"),
        lit(null).cast(taggedRightPayloadType(right, timeCol, rightCols)).as("_asof_payload"),
        struct(leftCols.map(col): _*).as("_asof_row")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_time"), col("_asof_side"), col("_asof_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight
      .unionByName(taggedLeft)
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
      .select(
        leftCols.map(c => col(s"_asof_row.$c").as(c)) ++
          rightCols.map(c => col(s"_asof_match.$c").as(s"$prefix$c")): _*)
  }

  /** The payload struct type, derived from the right frame's schema so the
    * left side's null literal unions cleanly.
    */
  private def taggedRightPayloadType(
      right: DataFrame, timeCol: String, rightCols: Seq[String]): org.apache.spark.sql.types.StructType = {
    val fields = (timeCol +: rightCols).distinct.map(c => right.schema(right.schema.fieldIndex(c)))
    org.apache.spark.sql.types.StructType(fields)
  }
}
