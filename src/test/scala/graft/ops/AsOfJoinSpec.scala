package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 10L, 100.0),
      ("A", 20L, 101.0),
      ("A", 25L, 102.0), // no quote between 20 and 25
      ("B", 15L, 50.0),
      ("C", 5L, 7.0) // key with no quotes at all
    ).toDF("sym", "t", "price")
  }

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", 8L, 1L),
      ("A", 10L, 2L), // tied with trade at t=10 — inclusive, so it matches
      ("A", 19L, 3L),
      ("A", 19L, 4L), // tie within right side — larger quote_id wins
      ("B", 30L, 5L) // after B's trade — must not match
    ).toDF("sym", "t", "quote_id")
  }

  test("backward as-of join matches latest right row at-or-before, per key") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id"))
      .select("sym", "t", "price", "matched_quote_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      ("A", 10L, 100.0, 2L),  // inclusive tie with quote at t=10
      ("A", 20L, 101.0, 4L),  // two quotes at t=19: larger quote_id wins
      ("A", 25L, 102.0, 4L),  // carries forward
      ("B", 15L, 50.0, -1L),  // B's only quote is later
      ("C", 5L, 7.0, -1L)     // no quotes for C
    ))
  }

  test("all left rows survive; multiple right columns attach with the prefix") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id", "t"),
      prefix = "q_")
    assert(out.count() == 5)
    assert(out.columns.toSet == Set("sym", "t", "price", "q_quote_id", "q_t"))
    val a20 = out.where(col("sym") === "A" && col("t") === 20).head()
    assert(a20.getAs[Long]("q_t") == 19L && a20.getAs[Long]("q_quote_id") == 4L)
  }

  test("plan shape: one shuffle on the key, no nested-loop join") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a nested loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one key shuffle, got $shuffles:\n$plan")
  }
}
