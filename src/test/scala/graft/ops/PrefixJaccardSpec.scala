package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJaccardSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 0
      (2L, "one two three four five six seven eight nine"),
      (3L, "one two three four five six seven eight ten"), // near-dup of 2
      (4L, "totally different text with no shared phrases at all"),
      // J exactly 0.5 pair: "a b c d e" vs "a b c d f" → 3-gram sets
      // {abc,bcd,cde} vs {abc,bcd,cdf}: inter 2, union 4
      (5L, "a b c d e"),
      (6L, "a b c d f")
    ).toDF("doc_id", "text")
  }

  /** Brute-force reference: every pair's exact Jaccard over 3-gram shingle sets. */
  private def bruteforce(threshold: Double): Set[(Long, Long, Double)] = {
    val sh = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select(col("a.id"), col("b.id"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("prefix filtering is exact: equals brute force at several thresholds") {
    for (t <- Seq(0.5, 0.7, 0.8)) {
      val pref = Dedup.prefixJaccardPairs(docs, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == bruteforce(t), s"threshold $t: prefix result diverged from brute force")
    }
  }

  test("a pair at exactly the threshold is kept (boundary, no float loss)") {
    val out = Dedup.prefixJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.contains((5L, 6L, 0.5)), s"J=0.5 pair must survive t=0.5: $out")
  }

  test("prefixes join far fewer postings than the full inverted index at high t") {
    // the pruning math the operator rides on: per doc of sz shingles only
    // sz - ceil(t·sz) + 1 enter the join; at t=0.8 that must cut the
    // posting volume by more than half on these docs
    val sizes = docs.select(size(Dedup.shingles(col("text"))).as("sz"))
      .collect().map(_.getInt(0))
    val fullPostings = sizes.sum
    val prefixPostings = sizes.map(sz => sz - math.ceil(0.8 * sz).toInt + 1).sum
    assert(prefixPostings < fullPostings / 2,
      s"prefix $prefixPostings vs full $fullPostings — pruning too weak")
  }
}
