package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the nearest right row with the
  * same key — the most recent at-or-before (`backward`) or the earliest
  * at-or-after (`forward`) — optionally within a `tolerance` window
  * (the pandas `merge_asof` surface).
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
  *      (time, side, payload) — time reversed for `forward`;
  *   3. running `last(payload, ignoreNulls)` over the sorted stream gives
  *      each left row the nearest right payload in scan direction;
  *   4. keep the left rows; `tolerance` null-outs matches farther than the
  *      bound (a post-filter — the nearest candidate is the ONLY candidate,
  *      any other right row is farther away, so no shape change).
  *
  * Cost: ONE shuffle of |left| + |right| rows — identical asymptotics to a
  * plain equi-join on the key, no matter how skewed the time distribution.
  * Window state is a single struct per partition stream (running last), so
  * memory is O(1) per task.
  *
  * Determinism: right rows sharing (key, time) are ordered by payload struct
  * (time first, then `rightCols` in order), so the LARGEST payload wins ties
  * in both directions — e.g. with `rightCols = Seq("event_id")`, the highest
  * event id at the tied timestamp. Left rows sort after right rows at the
  * same time (side 1 > side 0), which is what makes both joins inclusive.
  */
object AsOfJoin {

  /** Most recent right row with `time <= left.time` (within
    * `left.time - tolerance` when set).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "matched_",
      tolerance: Option[Long] = None
  ): DataFrame =
    unionScan(left, right, keyCols, timeCol, rightCols, prefix, tolerance, forwardDir = false)

  /** Earliest right row with `time >= left.time` (within
    * `left.time + tolerance` when set) — backward on reversed time order.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "matched_",
      tolerance: Option[Long] = None
  ): DataFrame =
    unionScan(left, right, keyCols, timeCol, rightCols, prefix, tolerance, forwardDir = true)

  /** Nearest right row by |Δtime| per key, in EITHER direction — the
    * symmetric completion of the as-of family (pandas
    * `merge_asof(direction='nearest')`): compose the backward and forward
    * scans and keep the closer match; an exact distance tie prefers the
    * at-or-before row, and ties within one direction follow that
    * direction's payload-struct order. `tolerance` bounds |Δ| on both
    * sides. Cost: two union scans — still two |L|+|R| key shuffles,
    * never a per-key nested loop.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "matched_",
      tolerance: Option[Long] = None
  ): DataFrame = {
    // both passes re-expose the matched time so the arbitration can
    // compute distances even when the caller didn't ask for it
    val cols = (timeCol +: rightCols).distinct
    val b = unionScan(left, right, keyCols, timeCol, cols, "_asof_b_", tolerance,
      forwardDir = false)
    val f = unionScan(b, right, keyCols, timeCol, cols, "_asof_f_", tolerance,
      forwardDir = true)
    val bt = col(s"_asof_b_$timeCol")
    val ft = col(s"_asof_f_$timeCol")
    val useB = ft.isNull || (bt.isNotNull && (col(timeCol) - bt) <= (ft - col(timeCol)))
    val out = rightCols.foldLeft(f) { (acc, c) =>
      acc.withColumn(s"$prefix$c",
        when(useB, col(s"_asof_b_$c")).otherwise(col(s"_asof_f_$c")))
    }
    out.drop((cols.map(c => s"_asof_b_$c") ++ cols.map(c => s"_asof_f_$c")): _*)
  }

  private def unionScan(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String,
      tolerance: Option[Long],
      forwardDir: Boolean
  ): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one right-side column to attach")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be non-negative, got $t"))
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

    // forward = the same running-last scan over reversed time: the last
    // payload seen in descending time order is the earliest at-or-after
    val timeOrder = if (forwardDir) col("_asof_time").desc else col("_asof_time").asc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("_asof_side"), col("_asof_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched =
      taggedRight.unionByName(taggedLeft)
        .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        // nearest-candidate argument: any other right row is farther away,
        // so bounding is a null-out of the single match, not a re-search
        val matchTime = col(s"_asof_match.$timeCol")
        val inRange =
          if (forwardDir) matchTime <= col("_asof_time") + tol
          else matchTime >= col("_asof_time") - tol
        matched.withColumn("_asof_match", when(inRange, col("_asof_match")))
    }
    bounded
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
