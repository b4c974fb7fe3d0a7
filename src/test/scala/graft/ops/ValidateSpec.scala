package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import Validate._

  private def reportMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap

  test("report: all check families, pass and fail, in one suite") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("alice"), "en", 10L),
      (2L, Some("bob"), "en", 200L),
      (3L, None, "xx", 3000L),
      (4L, Some("carol9"), "de", 50L)
    ).toDF("id", "name", "lang", "n")
    val rep = Validate.report(df, Seq(
      NotNull("name", minFraction = 0.9),          // 3/4 = 0.75 → fail
      NotNull("lang"),                             // 1.0 → pass
      Unique("id"),                                // pass
      InSet("lang", Seq("en", "de"), 0.7),         // 3/4 = 0.75 → pass
      InRange("n", 1, 1000, minFraction = 0.8),    // 3/4 = 0.75 → fail
      MatchesRegex("name", "^[a-z]+$", 0.5),       // 2/3 non-null match → pass
      RowCountBetween(2L, 10L)))                   // pass
    val got = reportMap(rep)
    assert(got("not_null(name)") == ((Some(0.75), false)))
    assert(got("not_null(lang)") == ((Some(1.0), true)))
    assert(got("unique(id)") == ((Some(1.0), true)))
    assert(got("in_set(lang)") == ((Some(0.75), true)))
    assert(got("in_range(n,1.0,1000.0)") == ((Some(0.75), false)))
    assert(got("matches(name)")._2 === true)
    assert(got("row_count(2,10)") == ((Some(4.0), true)))
    assert(!Validate.allPass(rep))
  }

  test("report: uniqueness counts nulls out of both sides; duplicates fail") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val got = reportMap(Validate.report(df, Seq(Unique("k"))))
    // 2 distinct / 3 non-null
    assert(got("unique(k)")._1.get > 0.66 && got("unique(k)")._1.get < 0.67)
    assert(!got("unique(k)")._2)
  }

  test("report: empty table fails fraction checks closed, row-count exact") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s").where(lit(false))
    val got = reportMap(Validate.report(df, Seq(
      NotNull("s"), RowCountBetween(0L, 5L), RowCountBetween(1L, 5L))))
    assert(got("not_null(s)") == ((None, false)))
    assert(got("row_count(0,5)")._2 === true)
    assert(got("row_count(1,5)")._2 === false)
  }

  test("report: one aggregate scan — no per-check jobs (single Aggregate pair in plan)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val rep = Validate.report(df, Seq(
      NotNull("s"), InRange("id", 0, 10), MatchesRegex("s", "^[ab]$"),
      RowCountBetween(1L, 10L)))
    // without a Unique check there is no Expand, and the whole suite is one
    // global aggregate over the scan: exactly one final/partial agg pair
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    val nAggs = "HashAggregate|SortAggregate".r.findAllIn(plan).length
    assert(nAggs <= 2, s"expected one partial/final aggregate pair, got:\n$plan")
    assert(Validate.allPass(rep))
  }

  test("report: duplicate check names rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Validate.report(df, Seq(NotNull("s"), NotNull("s", 0.5)))
    }
  }

  test("counters merge: reportFromCounters(merge(batches)) == report(whole), any split") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 90).map(i =>
      (i.toLong, if (i % 7 == 0) null else s"v$i", rnd.nextInt(100).toLong))
      .toDF("id", "s", "n")
    val checks = Seq(
      NotNull("s", 0.8), InRange("n", 10, 80, 0.5),
      MatchesRegex("s", "^v[0-9]+$"), RowCountBetween(50L, 100L))
    val whole = Validate.report(df, checks).collect().toSeq
    // uneven 3-way split, including an EMPTY batch
    val parts = Seq(
      df.where(col("id") <= 30), df.where(col("id") > 30),
      df.where(lit(false)))
      .map(Validate.counters(_, checks))
    val merged = Validate.reportFromCounters(Validate.mergeCounters(parts), checks)
      .collect().toSeq
    assert(merged == whole)
  }

  test("counters: Unique checks rejected as non-mergeable") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Validate.counters(df, Seq(NotNull("s"), Unique("id")))
    }
  }

  test("expectSchema: ok / type_mismatch / missing / extra, one row each") {
    import spark.implicits._
    val df = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    val got = Validate.expectSchema(df, Map(
      "id" -> "long", "name" -> "integer", "added_later" -> "string"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got("id") == (("ok", "long", "long")))
    assert(got("name") == (("type_mismatch", "integer", "string")))
    assert(got("added_later") == (("missing", "string", null)))
    assert(got("score") == (("extra", null, "double")))
  }

  test("fkOrphans: planted orphans and null FKs counted separately") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(98L), None, None)
      .toDF("fk")
    val r = Validate.fkOrphans(child, col("fk"), parent, col("pk"), "c>p")
      .collect().head
    assert(r.getString(0) == "c>p")
    assert(r.getLong(1) == 7L)  // all child rows
    assert(r.getLong(2) == 2L)  // null FKs
    assert(r.getLong(3) == 2L)  // 99, 98
  }

  test("fkOrphans: clean FK reports zero; duplicate parent keys don't double-count") {
    import spark.implicits._
    val parent = Seq(1L, 1L, 2L, 2L).toDF("pk") // dup keys — distinct-collapsed
    val child = Seq(1L, 2L, 2L, 1L).toDF("fk")
    val r = Validate.fkOrphans(child, col("fk"), parent, col("pk"), "clean")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 0L, 0L)))
  }
}
