package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk screens a dataset must pass before release —
  * the privacy face of the admission gates ([[Validate]] checks schema
  * health, this checks disclosure risk). Classic sweeney-style
  * k-anonymity: every combination of quasi-identifier values must be
  * shared by at least k rows, or the combination singles people out;
  * l-diversity additionally requires at least l distinct SENSITIVE values
  * inside each combination, or membership alone leaks the attribute.
  */
object Privacy {

  /** Per quasi-identifier combination: `(quasi…, group_size,
    * k_anonymous[, n_sensitive, l_diverse])` — one partial-aggregated
    * shuffle on the quasi key (plus the countDistinct Expand when
    * `sensitive` is set); the result is |combinations| rows, so the audit
    * costs one scan at any table size. Exact integer counts and boolean
    * flags — engine-portable with no float in sight.
    *
    * Null quasi values group as their own combination (null is a value an
    * attacker observes too); null sensitive values are NOT counted toward
    * diversity (a null attribute discloses nothing).
    */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int,
      sensitive: Option[String] = None,
      l: Int = 2
  ): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val base = df.groupBy(quasiCols.map(col): _*)
    sensitive match {
      case None =>
        base.agg(count(lit(1)).as("group_size"))
          .withColumn("k_anonymous", col("group_size") >= k)
      case Some(sc) =>
        base.agg(
            count(lit(1)).as("group_size"),
            countDistinct(col(sc)).as("n_sensitive"))
          .withColumn("k_anonymous", col("group_size") >= k)
          .withColumn("l_diverse", col("n_sensitive") >= l)
    }
  }

  /** The rows whose quasi-identifier combination fails the k threshold —
    * what a release pipeline must suppress or generalize. One broadcast
    * semi-join of the (tiny) failing-combination frame back onto the
    * table; null-safe on the quasi key (null combinations match
    * themselves).
    */
  def riskyRows(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val risky = kAnonymity(df, quasiCols, k)
      .where(!col("k_anonymous"))
      .select(quasiCols.map(c => col(c).as(s"__r_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    df.join(broadcast(risky), cond, "left_semi")
  }
}
