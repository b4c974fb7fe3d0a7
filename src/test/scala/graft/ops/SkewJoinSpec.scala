package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SkewJoin.saltedJoin: result equivalence with the plain join (inner and
  * left), hot-key fan-out across salts, and the no-blowup contract on the
  * big side.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    // hot key 1 (many rows), cold keys 2..4
    (1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "c"), (1L, 13L, "d"),
    (1L, 14L, "e"), (1L, 15L, "f"), (2L, 16L, "g"), (3L, 17L, "h"),
    (4L, 18L, "i"), (5L, 19L, "j") // key 5 has no dimension row
  ).toDF("k", "row_id", "payload")

  private def dim = Seq((1L, "hot"), (2L, "two"), (3L, "three"), (4L, "four"))
    .toDF("k", "name")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("inner salted join matches the plain inner join") {
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), saltSource = col("row_id"), salts = 8)
    val plain  = facts.join(dim, Seq("k"), "inner")
    assert(sortedRows(salted.select("k", "row_id", "payload", "name")) ===
      sortedRows(plain.select("k", "row_id", "payload", "name")))
  }

  test("left salted join surfaces unmatched left rows exactly once") {
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), saltSource = col("row_id"),
      salts = 8, joinType = "left")
    val plain = facts.join(dim, Seq("k"), "left")
    assert(sortedRows(salted.select("k", "row_id", "payload", "name")) ===
      sortedRows(plain.select("k", "row_id", "payload", "name")))
    // key 5 (no dim row) appears once with a null name
    assert(salted.where($"k" === 5L && $"name".isNull).count() === 1L)
  }

  test("hot key rows spread across multiple salt values") {
    val saltCol = pmod(xxhash64($"row_id"), lit(8)).cast("int")
    val spread = facts.where($"k" === 1L).select(saltCol.as("s")).distinct().count()
    assert(spread > 1L, "hot-key rows should hash to more than one salt bucket")
  }

  test("aggregate over the salted join matches the plain-join aggregate") {
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), saltSource = col("row_id"), salts = 4)
      .groupBy("name").agg(count(lit(1)).as("n"))
    val plain = facts.join(dim, Seq("k")).groupBy("name").agg(count(lit(1)).as("n"))
    assert(sortedRows(salted) === sortedRows(plain))
  }

  test("rejects unsupported join types and non-positive salts") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts, dim, Seq("k"), col("row_id"), joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts, dim, Seq("k"), col("row_id"), salts = 0)
    }
  }

  test("saltPlan: exact ceil factors, shares sum to 1, minRows prunes the tail") {
    import spark.implicits._
    val df = (Seq.fill(2500)("hot") ++ Seq.fill(999)("warm") ++ Seq.fill(1)("cold"))
      .toDF("k")
    val got = SkewJoin.saltPlan(df, Seq("k"), targetPerTask = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got("hot") == ((2500L, math.rint(2500.0 / 3500 * 1e6) / 1e6, 3L)))
    assert(got("warm")._3 == 1L && got("cold")._3 == 1L)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    val pruned = SkewJoin.saltPlan(df, Seq("k"), targetPerTask = 1000L, minRows = 10L)
      .collect().map(_.getString(0)).toSet
    assert(pruned == Set("hot", "warm"))
  }
}
