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

  test("forward as-of join matches earliest right row at-or-after, per key") {
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", Seq("quote_id"))
      .select("sym", "t", "price", "matched_quote_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      ("A", 10L, 100.0, 2L), // inclusive tie with quote at t=10
      ("A", 20L, 101.0, -1L), // no quote after 20 for A
      ("A", 25L, 102.0, -1L),
      ("B", 15L, 50.0, 5L),  // B's quote at 30 is ahead
      ("C", 5L, 7.0, -1L)
    ), s"got $out")
  }

  test("forward/backward agree with the brute-force LATERAL-style oracle, incl. tie order") {
    // oracle: per left row, scan all right rows of the key, keep the
    // nearest in direction; largest quote_id wins ties
    val ts = trades.collect().map(r => (r.getString(0), r.getLong(1)))
    val qs = quotes.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def oracle(fwd: Boolean): Set[(String, Long, Long)] = ts.map { case (sym, t) =>
      val cands = qs.filter(q => q._1 == sym && (if (fwd) q._2 >= t else q._2 <= t))
      val best =
        if (cands.isEmpty) -1L
        else {
          val nearest = if (fwd) cands.map(_._2).min else cands.map(_._2).max
          cands.filter(_._2 == nearest).map(_._3).max
        }
      (sym, t, best)
    }.toSet
    def run(fwd: Boolean): Set[(String, Long, Long)] = {
      val df = if (fwd) AsOfJoin.forward(trades, quotes, Seq("sym"), "t", Seq("quote_id"))
               else AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id"))
      df.select("sym", "t", "matched_quote_id")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    }
    assert(run(fwd = false) == oracle(fwd = false))
    assert(run(fwd = true) == oracle(fwd = true))
  }

  test("tolerance bounds the lookback/lookahead, boundary inclusive") {
    // backward from A@25: nearest quote is 19 (distance 6)
    def backAt(tol: Long): Long = {
      val r = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id"),
        tolerance = Some(tol)).where(col("sym") === "A" && col("t") === 25).head()
      if (r.isNullAt(r.fieldIndex("matched_quote_id"))) -1L
      else r.getAs[Long]("matched_quote_id")
    }
    assert(backAt(6L) == 4L,  "distance exactly == tolerance must match (inclusive)")
    assert(backAt(5L) == -1L, "match farther than tolerance must null out")
    assert(backAt(0L) == -1L)
    // forward from B@15: nearest quote is 30 (distance 15)
    def fwdAt(tol: Long): Long = {
      val r = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", Seq("quote_id"),
        tolerance = Some(tol)).where(col("sym") === "B").head()
      if (r.isNullAt(r.fieldIndex("matched_quote_id"))) -1L
      else r.getAs[Long]("matched_quote_id")
    }
    assert(fwdAt(15L) == 5L, "distance exactly == tolerance must match (inclusive)")
    assert(fwdAt(14L) == -1L)
    // tolerance=0: only exact-time matches survive (A@10 has quote@10)
    val exact = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", Seq("quote_id"),
      tolerance = Some(0L)).where(col("matched_quote_id").isNotNull)
      .select("sym", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact == Set(("A", 10L)))
  }

  test("forward plan keeps the one-shuffle union-scan shape") {
    val plan = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", Seq("quote_id"),
      tolerance = Some(100L)).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a nested loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one key shuffle, got $shuffles:\n$plan")
  }

  test("nearest: closer side wins; exact tie prefers at-or-before; tolerance bounds both") {
    import spark.implicits._
    val l = Seq(("A", 10L), ("A", 21L), ("A", 30L), ("B", 5L), ("C", 9L))
      .toDF("k", "t")
    val r = Seq(
      ("A", 8L, 1L),   // 2 behind the t=10 left
      ("A", 11L, 2L),  // 1 ahead of t=10 → wins there
      ("A", 19L, 3L),  // 2 behind t=21
      ("A", 23L, 4L),  // 2 ahead of t=21 — exact tie → behind (3) wins
      ("B", 50L, 5L)   // 45 ahead of B's t=5 — outside tolerance 40
    ).toDF("k", "t", "rid")
    val out = AsOfJoin.nearest(l, r, Seq("k"), "t", Seq("rid"),
        tolerance = Some(40L))
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(out == Set(
      ("A", 10L, 2L),  // ahead at distance 1 beats behind at 2
      ("A", 21L, 3L),  // tie at distance 2 → at-or-before preferred
      ("A", 30L, 4L),  // only behind in range
      ("B", 5L, -1L),  // tolerance null-out
      ("C", 9L, -1L))) // no right rows at all
  }

  test("nearest without tolerance falls back across any distance; time re-exposure works") {
    import spark.implicits._
    val l = Seq(("B", 5L)).toDF("k", "t")
    val r = Seq(("B", 50L, 5L)).toDF("k", "t", "rid")
    val out = AsOfJoin.nearest(l, r, Seq("k"), "t", Seq("rid", "t"), prefix = "m_")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).head
    assert(out == ((5L, 5L, 50L))) // (t, m_rid, m_t)
  }
}
