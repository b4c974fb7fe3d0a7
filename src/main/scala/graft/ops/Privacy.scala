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

  /** t-closeness audit — the escalation past [[kAnonymity]]'s l-diversity
    * (a group can hold l distinct diagnoses and still be 99% "cancer";
    * diversity passes, disclosure happens anyway): per quasi-identifier
    * combination, the TOTAL-VARIATION distance between the group's
    * sensitive-value distribution and the whole table's,
    * `t(g) = ½ Σ_v |p_v|g − p_v|`, with `t_close = t(g) ≤ t` on the
    * rounded distance (engine-portable compare). Returns
    * `(quasi…, group_size, t_distance, t_close)`.
    *
    * Values absent from a group contribute their full global mass; that
    * tail is folded CLOSED-FORM as `1 − Σ_{v∈g} m_v/N` instead of a
    * sparse-dense outer join — the per-group work stays proportional to
    * the values the group actually has. Null sensitive values are
    * excluded (disclose nothing); null quasi values group as their own
    * combination ([[kAnonymity]]'s contract) — group sizes ride a window
    * PARTITIONED by the quasi key, so no join has to match null keys.
    *
    * Scale shape: one cells shuffle on `(quasi…, v)`, one margins
    * shuffle on `v`, a one-row total attach, and a partitioned window —
    * each |p−q| term is a handful of IEEE ops off exact counts,
    * decimal-summed per group (order-free).
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: String,
      t: Double,
      scale: Int = 6
  ): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(t >= 0.0 && t <= 1.0, s"t must be in [0, 1], got $t")
    val qs = quasiCols.map(col)
    // tracked: feeds the margins aggregate, the total, and the term join
    val cells = graft.Caches.track(
      df.where(col(sensitive).isNotNull)
        .groupBy(qs :+ col(sensitive).as("_v"): _*)
        .agg(count(lit(1)).as("_o")))
    val mv = cells.groupBy(col("_v")).agg(sum(col("_o")).as("_m"))
    val tot = cells.agg(sum(col("_o")).as("_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qs: _*)
    val terms = cells.join(mv, Seq("_v")).crossJoin(tot)
      .withColumn("group_size", sum(col("_o")).over(w))
      .withColumn("_ad",
        abs(col("_o").cast("double") / col("group_size")
          - col("_m").cast("double") / col("_n")))
    terms.groupBy(qs :+ col("group_size"): _*)
      .agg(
        sum(col("_ad").cast("decimal(38,12)")).as("_s"),
        sum(col("_m")).as("_sm"),
        first(col("_n")).as("_tn"))
      .withColumn("t_distance",
        round((col("_s").cast("double")
          + (lit(1) - col("_sm").cast("double") / col("_tn"))) / 2, scale))
      .select(qs ++ Seq(col("group_size"), col("t_distance"),
        (col("t_distance") <= t).as("t_close")): _*)
  }

  /** Entropy ℓ-diversity audit (Machanavajjhala et al. 2007) — the gap
    * between [[kAnonymity]]'s distinct-ℓ and [[tCloseness]]: a group
    * holding ℓ distinct sensitive values passes distinct-ℓ even when one
    * value carries 99% of the mass; entropy-ℓ requires the group's
    * sensitive DISTRIBUTION to carry at least `ln ℓ` nats
    * (`−Σ p_v ln p_v ≥ ln ℓ` ⟺ effective diversity `e^H ≥ ℓ`). Returns
    * one row per quasi combination
    * `(quasi…, group_size, n_sensitive, entropy, effective_l,
    * l_diverse)`, the compare on the ROUNDED effective ℓ
    * (engine-portable).
    *
    * Determinism: group entropy folds the exact identity
    * `H = ln n − (Σ c·ln c)/n` with each `c·ln c` decimal-cast before
    * the sum (the token-entropy discipline) — order-free and exact.
    *
    * Scale shape: one cells shuffle on `(quasi…, v)` whose output is
    * |combinations|×|values| bounded, then one |cells|-row fold — the
    * audit costs one scan at any table size. Null sensitive values are
    * excluded (disclose nothing); null quasi values group as their own
    * combination.
    */
  def entropyLDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: String,
      l: Double = 2.0,
      scale: Int = 6
  ): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(l >= 1.0, s"l must be >= 1, got $l")
    val qs = quasiCols.map(col)
    val cells = df.where(col(sensitive).isNotNull)
      .groupBy(qs :+ col(sensitive).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val ent = (log(col("group_size").cast("double"))
      - col("_s").cast("double") / col("group_size"))
    cells.groupBy(qs: _*)
      .agg(
        sum(col("_c")).as("group_size"),
        count(lit(1)).as("n_sensitive"),
        sum((col("_c").cast("double") * log(col("_c").cast("double")))
          .cast("decimal(38,12)")).as("_s"))
      .withColumn("entropy", round(ent, scale))
      .withColumn("effective_l", round(exp(ent), scale))
      .select(qs ++ Seq(col("group_size"), col("n_sensitive"), col("entropy"),
        col("effective_l"), (col("effective_l") >= l).as("l_diverse")): _*)
  }
}
