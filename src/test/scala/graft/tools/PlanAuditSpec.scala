package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Pins the PlanAudit unpartitioned-window detector: the one anti-pattern
  * class the audit missed in round 9 (single-partition WindowExec hiding
  * inside the eval-stats family) must flag a deliberately global window
  * and stay quiet on partitioned / prefix-sum plans.
  */
class PlanAuditSpec extends SparkSpec {

  test("unpartitionedWindows flags empty-partition-spec windows only") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, i % 3)).toDF("id", "g")

    // deliberately global rank — the scale-killer shape
    val global = df.withColumn("r", row_number().over(Window.orderBy(col("id"))))
    assert(PlanAudit.unpartitionedWindows(global) == 1)

    // two stacked global windows with DIFFERENT specs (same-spec windows
    // collapse into one WindowExec) count twice
    val doubled = global.withColumn("c",
      sum(col("id")).over(Window.orderBy(col("g"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    assert(PlanAudit.unpartitionedWindows(doubled) == 2)

    // a PARTITIONED window is fine
    val part = df.withColumn("r",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("id"))))
    assert(PlanAudit.unpartitionedWindows(part) == 0)

    // the prefix-sum replacements plan no window at all
    val nt = graft.ops.Stats.globalNtile(df, 4, Seq(col("id")))
    assert(PlanAudit.unpartitionedWindows(nt) == 0)
    val rt = graft.ops.Stats.runningTotal(df, Seq(col("id")), lit(1L))
    assert(PlanAudit.unpartitionedWindows(rt) == 0)
    graft.Caches.clear()
  }
}
