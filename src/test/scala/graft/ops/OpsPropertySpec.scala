package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests over randomly generated inputs for the round-7 operators:
  * salted-join equivalence, chunk coverage, and temperature-mix rate
  * invariants. Raw `Gen.apply` sampling (scalatestplus is not on this
  * classpath — see NOTES.md).
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: saltedJoin(inner) equals the plain join on random skewed tables") {
    val factGen = for {
      n    <- Gen.choose(1, 60)
      keys <- Gen.listOfN(n, Gen.frequency(6 -> Gen.const(1L), 4 -> Gen.choose(1L, 8L)))
    } yield keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    samples(factGen, 6).foreach { rows =>
      val facts = rows.toDF("k", "row_id")
      val dim   = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), col("row_id"), salts = 5)
        .collect().map(_.mkString("|")).sorted.toSeq
      val plain = facts.join(dim, Seq("k"))
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(salted === plain, s"mismatch for ${rows.take(5)}…")
    }
  }

  test("property: chunk windows cover every token exactly, in order") {
    val gen = for {
      n         <- Gen.choose(1, 40)
      maxTokens <- Gen.choose(1, 12)
      stride    <- Gen.choose(1, maxTokens)
    } yield (n, maxTokens, stride)
    samples(gen, 12).foreach { case (n, maxTokens, stride) =>
      val toks = (0 until n).map(i => s"t$i")
      val df   = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextAnalysis.chunk(df, maxTokens = maxTokens, stride = stride)
        .orderBy("chunk_id").collect()
      // every chunk w has the exact expected slice
      chunks.foreach { r =>
        val w     = r.getLong(1).toInt
        val start = w * stride
        val expect = toks.slice(start, start + maxTokens)
        assert(r.getString(2) === expect.mkString(" "), s"(n=$n m=$maxTokens s=$stride w=$w)")
        assert(r.getLong(3) === expect.length.toLong)
      }
      // full coverage: the union of windows is exactly [0, n)
      val covered = chunks.flatMap { r =>
        val w = r.getLong(1).toInt; (w * stride) until math.min(w * stride + maxTokens, n)
      }.toSet
      assert(covered === (0 until n).toSet, s"coverage gap (n=$n m=$maxTokens s=$stride)")
      // no window is fully contained in its predecessor
      val ids = chunks.map(_.getLong(1)).toSeq
      assert(ids === (0L until ids.length.toLong), "window ids are dense from 0")
    }
  }

  test("round-7 operators degrade safely on empty input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.vocabulary(emptyDocs).isEmpty)
    assert(TextAnalysis.topTokens(emptyDocs, k = 5).isEmpty)
    assert(TextAnalysis.chunk(emptyDocs).isEmpty)
    assert(TextAnalysis.redactPii(emptyDocs).isEmpty)
    val emptyLabeled = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Sampling.temperatureMix(emptyLabeled, "lang", key = col("doc_id")).isEmpty)
    val emptyVecs = Seq.empty[(Long, String, Seq[Double])].toDF("vec_id", "blk", "embedding")
    assert(Dedup.semanticDedup(emptyVecs, bucketCol = col("blk")).isEmpty)
    val emptyFacts = Seq.empty[(Long, Long)].toDF("k", "row_id")
    val dim        = Seq((1L, "one")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(emptyFacts, dim, Seq("k"), col("row_id")).isEmpty)
    val emptyGrid = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(graft.io.Layout.zorderBy(emptyGrid, Seq("x", "y"), numPartitions = 4).isEmpty)
  }

  test("property: temperatureMix keeps per-stratum rates in (0, 1] and total near target") {
    val gen = for {
      c1 <- Gen.choose(50, 400)
      c2 <- Gen.choose(50, 400)
      c3 <- Gen.choose(50, 400)
    } yield Seq("a" -> c1, "b" -> c2, "c" -> c3)
    samples(gen, 5).foreach { strata =>
      val rows = strata.flatMap { case (s, c) => (0 until c).map(i => (s"$s$i".hashCode.toLong, s)) }
      val df = rows.toDF("doc_id", "lang").dropDuplicates("doc_id")
      val total = df.count().toDouble
      val out = Sampling.temperatureMix(df, "lang", alpha = 0.5, targetFraction = 0.5,
        key = col("doc_id"))
      val kept = out.count().toDouble
      // capped strata can only pull the total BELOW the target, never above;
      // Binomial noise bounds the rest (generous 3-sigma-ish slack)
      assert(kept <= 0.5 * total + 3 * math.sqrt(total), s"kept=$kept total=$total")
      assert(kept >= 0.25 * total, s"kept=$kept total=$total")
    }
  }
}
