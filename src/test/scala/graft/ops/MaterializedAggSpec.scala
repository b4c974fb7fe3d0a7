package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializedAggSpec extends SparkSpec {

  private def facts = {
    import spark.implicits._
    (1L to 90L).map(i =>
      (i, if (i % 2 == 0) "x" else "y", (i % 7).toDouble,
        if (i % 5 == 0) null else Long.box(i % 11)))
      .toDF("id", "g", "a", "b")
  }

  test("merge of batch partials ≡ partials over the whole table, any split") {
    val whole = MaterializedAgg.partials(facts, Seq("g"), Seq("a", "b"))
      .collect().map(_.toString).sorted.toSeq
    for (k <- Seq(2, 3, 7)) {
      val parts = (0 until k).map(i =>
        MaterializedAgg.partials(facts.where(col("id") % k === i), Seq("g"), Seq("a", "b")))
      val merged = MaterializedAgg.merge(parts)
        .collect().map(_.toString).sorted.toSeq
      assert(merged == whole, s"split into $k batches must merge exactly")
    }
  }

  test("merge is associative: re-merging prior state with a new batch works") {
    val b1 = MaterializedAgg.partials(facts.where(col("id") <= 30), Seq("g"), Seq("a", "b"))
    val b2 = MaterializedAgg.partials(
      facts.where(col("id") > 30 && col("id") <= 60), Seq("g"), Seq("a", "b"))
    val b3 = MaterializedAgg.partials(facts.where(col("id") > 60), Seq("g"), Seq("a", "b"))
    val stepwise = MaterializedAgg.merge(Seq(MaterializedAgg.merge(Seq(b1, b2)), b3))
      .collect().map(_.toString).sorted.toSeq
    val flat = MaterializedAgg.merge(Seq(b1, b2, b3))
      .collect().map(_.toString).sorted.toSeq
    assert(stepwise == flat)
  }

  test("HLL distinct state: merged sketches estimate ≡ whole-table sketch, exact when small") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, if (i % 2 == 0) "x" else "y", i % 37))
      .toDF("id", "g", "v")
    val whole = MaterializedAgg.serve(
        MaterializedAgg.partials(df, Seq("g"), Seq("v"), distinctCols = Seq("v")))
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("approx_distinct_v")))
      .toMap
    val parts = (0 until 3).map(i =>
      MaterializedAgg.partials(df.where(col("id") % 3 === i), Seq("g"), Seq("v"),
        distinctCols = Seq("v")))
    val merged = MaterializedAgg.serve(MaterializedAgg.merge(parts))
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("approx_distinct_v")))
      .toMap
    assert(merged == whole, "sketch union must reproduce the whole-table estimate")
    // 37 distinct values is far below HLL error onset: the estimate is exact
    assert(whole("x") == 37L || whole("x") == 36L)
    assert(whole.values.forall(v => v >= 36L && v <= 38L))
  }

  test("serve: avg = sum/cnt handles nulls; all-null column yields NULL avg") {
    import spark.implicits._
    val df = Seq(
      ("x", Some(2.0), None), ("x", Some(4.0), None),
      ("y", Some(1.0), Some(10L))
    ).map { case (g, a, b) => (g, a.map(Double.box).orNull, b.map(Long.box).orNull) }
      .toDF("g", "a", "b")
    val served = MaterializedAgg.serve(
        MaterializedAgg.partials(df, Seq("g"), Seq("a", "b")))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = served("x")
    assert(x.getLong(1) == 2L)                   // n
    assert(x.getDouble(3) == 3.0)                // avg_a
    assert(x.isNullAt(7), "all-null b → NULL avg") // avg_b
    val y = served("y")
    assert(y.getDouble(6) == 10.0 && y.getDouble(7) == 10.0) // sum_b, avg_b
  }
}
