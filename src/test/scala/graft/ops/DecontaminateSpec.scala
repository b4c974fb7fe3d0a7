package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("overlapPairs counts distinct shared n-grams; threshold filters") {
    val train = docs(
      (1L, "the cat sat on the mat today"),          // shares 3-grams with eval 100
      (2L, "completely different words entirely here now"),
      (3L, "the cat sat on the mat")                 // shares with eval 100 too
    )
    val ev = docs((100L, "the cat sat on the mat yesterday"))
    val out = Decontaminate.overlapPairs(train, ev, n = 3, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "the cat sat","cat sat on","sat on the","on the mat" = 4 shared each
    assert(out == Set((1L, 100L, 4L), (3L, 100L, 4L)), s"got $out")
  }

  test("overlap verdict covers the full training universe with keep/drop semantics") {
    val train = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta unrelated tail"))
    val ev = docs((9L, "alpha beta gamma delta epsilon eta"))
    val out = Decontaminate.overlap(train, ev, n = 3, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, 1L, 3L, true),  // shares "alpha beta gamma","beta gamma delta","gamma delta epsilon"
      (2L, 0L, 0L, false),
      (3L, 1L, 2L, true)), s"got $out")
  }

  test("bloom prune is no-false-negative: matches a brute-force gram intersection") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("data", "spark", "scale", "join", "graph", "text", "model", "train", "eval", "clean")
    def sentence() = Seq.fill(12)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val evRows = (100L to 110L).map(i => (i, sentence()))
    // every third train doc plagiarizes a 7-token span of some eval doc —
    // the contamination the operator exists to catch; the rest are random
    val train = (1L to 60L).map { i =>
      val t = sentence()
      if (i % 3 == 0) {
        val src = evRows((i % evRows.size).toInt)._2.split(" ").take(7).mkString(" ")
        (i, src + " " + t.split(" ").drop(7).mkString(" "))
      } else (i, t)
    }.toDF("doc_id", "text")
    val ev = evRows.toDF("doc_id", "text")

    val fast = Decontaminate.overlapPairs(train, ev, n = 3, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Decontaminate.gramPostings(train, n = 3).groupBy("id").agg(collect_set("gram").as("g"))
      .crossJoin(
        Decontaminate.gramPostings(ev, n = 3).groupBy("id").agg(collect_set("gram").as("ge"))
          .select(col("id").as("eid"), col("ge")))
      .select(col("id"), col("eid"), size(array_intersect(col("g"), col("ge"))).cast("long").as("shared"))
      .where(col("shared") >= 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == brute, s"fast-brute=${(fast -- brute).take(3)} brute-fast=${(brute -- fast).take(3)}")
    assert(brute.nonEmpty, "degenerate fixture: brute force found nothing")
  }

  test("substringOverlap flags verbatim window quotations, not mere vocabulary overlap") {
    val train = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta trailing words here"), // quotes ev 8-window
      (2L, "theta eta zeta epsilon delta gamma beta alpha"),                     // same words, reversed
      (3L, "totally unrelated content with nothing shared at all"))
    val ev = docs((9L, "alpha beta gamma delta epsilon zeta eta theta"))
    val out = Decontaminate.substringOverlap(train, ev, window = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, 1L, 1L, true),   // exactly the one 8-token window is shared
      (2L, 0L, 0L, false),  // reversed order = no exact substring
      (3L, 0L, 0L, false)), s"got $out")
  }

  test("substringOverlapPairs counts distinct shared windows across a longer quotation") {
    // train doc embeds a 10-token eval span → 3 distinct 8-token windows
    val span = "one two three four five six seven eight nine ten"
    val train = docs((1L, s"prefix words then $span and a tail"))
    val ev    = docs((9L, span))
    val out = Decontaminate.substringOverlapPairs(train, ev, window = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 9L, 3L)), s"got $out")
  }

  test("overlapFromIndex ≡ overlap at the index's shingle width; verdict over the index universe") {
    import org.apache.spark.sql.functions.col
    val train = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight at dusk",
      2L -> "completely unrelated text about spark physical planning rules",
      3L -> "short doc")
    val eval = docs(
      10L -> "witnesses saw the quick brown fox jumps over the lazy dog tonight",
      11L -> "nothing here matches anything in the training corpus at all")
    val idx = graft.ops.Dedup.LshIndex(numHashes = 16, shingleWidth = 3)
    val path = java.nio.file.Files.createTempDirectory("lsh_idx_decon").toString + "/index"
    idx.save(train, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val served = rows(Decontaminate.overlapFromIndex(
      spark, idx, path, eval, minShared = 3L))
    val inline = rows(Decontaminate.overlap(
      train, eval, n = 3, minShared = 3L))
    assert(served == inline, s"index-served $served vs inline $inline")
    // doc 1 is quoted by eval 10; docs 2 and 3 are clean but PRESENT
    val byId = served.map(t => t._1 -> t._4).toMap
    assert(byId(1L) && !byId(2L) && !byId(3L), served.toString)
    graft.Caches.clear()
  }

  test("empty eval set flags nothing; everything survives") {
    val train = docs((1L, "a b c d"), (2L, "e f g h"))
    val ev    = docs()
    val out = Decontaminate.overlap(train, ev, n = 3, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
    assert(out == Set((1L, false), (2L, false)), s"got $out")
  }

  test("semanticOverlap: paraphrase-near vectors flagged, orthogonal ones clean") {
    import spark.implicits._
    // eval vector e = (1,0,0); train: t1 ≈ e (cos ~0.995), t2 ⊥ e (cos 0),
    // t3 = -e (cos -1). threshold 0.9 flags only t1
    val ev = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(0.995, 0.0999, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(-1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticOverlap(train, ev, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got(1L)._1 == 1L && got(1L)._3)
    assert(got(1L)._2 > 0.99)
    assert(got(2L) == ((0L, 0.0, false)))
    assert(got(3L) == ((0L, -1.0, false)))
    // every train row gets a verdict
    assert(got.keySet == Set(1L, 2L, 3L))
  }
}
