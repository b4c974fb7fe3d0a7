package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OverlapDriftSpec extends SparkSpec {

  test("diversityIndex: uniform mix → effective = categories; concentrated → near 1") {
    import spark.implicits._
    val df = (Seq.fill(10)(("u", "a")) ++ Seq.fill(10)(("u", "b")) ++
      Seq.fill(10)(("u", "c")) ++ Seq.fill(10)(("u", "d")) ++
      Seq.fill(37)(("c", "x")) ++ Seq.fill(1)(("c", "y")) ++ Seq.fill(2)(("c", "z")))
      .toDF("lang", "src")
    val got = Stats.diversityIndex(df, dimCol = "src", strataCols = Seq("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("u") == ((40L, 4L, 0.25, 4.0)))
    // 37/40, 1/40, 2/40 → simpson = (1369+1+4)/1600 = 0.85875
    assert(got("c")._3 == 0.85875)
    assert(got("c")._4 == BigDecimal(1 / 0.85875).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("diversityIndex: no strata = one global row; partition-invariant") {
    import spark.implicits._
    val df = (1 to 60).map(i => s"s${i % 6}").toDF("src")
    val a = Stats.diversityIndex(df, "src").collect().head
    val b = Stats.diversityIndex(df.repartition(7), "src").collect().head
    assert(a == b)
    assert(a.getLong(0) == 60L && a.getLong(1) == 6L && a.getDouble(3) == 6.0)
  }

  test("embeddingDrift: identical snapshots → cos 1, shift 0; hand-computed shift") {
    import spark.implicits._
    val a = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val same = SimilaritySearch.embeddingDrift(a, a).collect().head
    assert(same.getDouble(0) == 1.0 && same.getDouble(1) == 0.0)
    assert(same.getLong(2) == 2L && same.getLong(3) == 2L)
    // means: a → (1, 1); b → (0, 3) → dot 3, |a|=√2, |b|=3, cos = 3/(3√2)
    val b = Seq((1L, Array(0.0f, 6.0f)), (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.embeddingDrift(a, b).collect().head
    assert(got.getDouble(0) == BigDecimal(3.0 / (math.sqrt(2.0) * 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // shift = √((1-0)² + (1-3)²) = √5
    assert(got.getDouble(1) == BigDecimal(math.sqrt(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("keySetSignatures: mergeable (min-merge of batch sigs == whole) and duplicate-proof") {
    import spark.implicits._
    val items = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "y"), ("b", "z"))
      .toDF("key", "item")
    val whole = Dedup.keySetSignatures(items, numHashes = 8, hash = Md5Hash)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // batch split + min-merge
    val p1 = Dedup.keySetSignatures(items.limit(2), numHashes = 8, hash = Md5Hash)
    val p2 = Dedup.keySetSignatures(items.offset(2), numHashes = 8, hash = Md5Hash)
    val merged = p1.union(p2)
      .select(col("key"), posexplode(col("sig")).as(Seq("i", "h")))
      .groupBy("key", "i").agg(min("h").as("h"))
      .groupBy("key").agg(array_sort(collect_list(struct(col("i"), col("h")))).as("s"))
      .select(col("key"), col("s.h").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == whole)
  }

  test("signatureOverlapEstimates: identical sets agree fully, disjoint near zero, estimate tracks true Jaccard") {
    import spark.implicits._
    val items =
      (1 to 200).map(i => ("a", s"t$i")) ++
        (1 to 200).map(i => ("b", s"t$i")) ++          // b == a
        (101 to 300).map(i => ("c", s"t$i")) ++        // |c ∩ a| / |c ∪ a| = 100/300
        (1001 to 1200).map(i => ("d", s"t$i"))         // disjoint
    val sigs = Dedup.keySetSignatures(items.toDF("key", "item"), numHashes = 64,
      hash = Md5Hash)
    val got = Dedup.signatureOverlapEstimates(sigs, numHashes = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "d")) == 0.0)
    val estAc = got(("a", "c"))
    assert(estAc > 0.15 && estAc < 0.55, s"est $estAc should track true 1/3")
  }
}
