package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // single stream (streams = 1): packing order is doc_id order
    Seq(
      (0L, 400L), (1L, 500L), (2L, 300L), // 0,1 fill bin 0 up to 900; 2 starts at 900, spans into bin 1
      (3L, 1200L),                        // starts at 1200 -> bin 1, spans into bin 2
      (4L, 10L)                           // starts at 2400 -> bin 2
    ).toDF("doc_id", "n")
  }

  test("concat-and-chunk: bin = floor(exclusive-prefix-sum / budget), offset = remainder") {
    val out = Packing.packSequences(docs, tokens = col("n"), budget = 1000, streams = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      (0L, 0L, 0L), (1L, 0L, 400L), (2L, 0L, 900L),
      (3L, 1L, 200L), (4L, 2L, 400L)), s"got $out")
  }

  test("streams pack independently and deterministically under repartition") {
    import spark.implicits._
    val big = (0L until 500L).map(i => (i, 1L + i % 97)).toDF("doc_id", "n")
    val a = Packing.packSequences(big, col("n"), budget = 256, streams = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val b = Packing.packSequences(big.repartition(13), col("n"), budget = 256, streams = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(a == b, "packing must not depend on input partitioning")
    // stream assignment is id mod streams
    assert(a.forall { case (id, stream, _, _) => stream == id % 8 })
    // within a stream, offsets reconstruct the exclusive prefix sum exactly
    val byStream = a.groupBy(_._2)
    byStream.values.foreach { rows =>
      val sorted = rows.toSeq.sortBy(_._1)
      var run = 0L
      sorted.foreach { case (id, _, bin, off) =>
        assert(bin == run / 256 && off == run % 256, s"doc $id expected offset $run")
        run += 1L + id % 97
      }
    }
  }

  test("binStats: every interior bin of a stream has tokens flowing through it") {
    val out = Packing.binStats(
      Packing.packSequences(docs, col("n"), budget = 1000, streams = 1))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // bin 0: docs 0,1,2 start (1200 tokens start here); bin 1: doc 3; bin 2: doc 4
    assert(out == Set((0L, 3L, 1200L), (1L, 1L, 1200L), (2L, 1L, 10L)), s"got $out")
  }

  test("any token counter plugs in: whitespace and BPE-ish budgets both pack exactly") {
    import spark.implicits._
    val txt = Seq(
      (0L, "hello world"),                 // 2 ws tokens; BPE-ish splits punctuation-free words the same
      (1L, "don't tokenize, naively!"),    // 3 ws tokens, more BPE-ish pieces
      (2L, "a b c d e")                    // 5 of each
    ).toDF("doc_id", "text")
    def offsets(counter: org.apache.spark.sql.Column) =
      Packing.packSequences(txt, counter, budget = 8, streams = 1)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val ws  = offsets(TextAnalysis.tokenCount(col("text")))
    val bpe = offsets(TextAnalysis.bpeishTokenCount(col("text")))
    // each packing is the exact exclusive prefix sum of ITS counter
    Seq(ws, bpe).foreach { m =>
      var run = 0L
      Seq(0L, 1L, 2L).foreach { id =>
        val (n, bin, off) = m(id)
        assert(bin == run / 8 && off == run % 8, s"doc $id: expected offset $run in $m")
        run += n
      }
    }
    // the counters genuinely disagree on punctuation-bearing text, so the
    // two packings place later docs differently — the budget column is a
    // real knob, not a cosmetic parameter
    assert(ws(1L)._1 < bpe(1L)._1, s"ws=${ws(1L)} bpe=${bpe(1L)}")
    assert(ws(2L) != bpe(2L), "doc 2's placement must shift under the BPE-ish budget")
  }

  test("assembleBins concatenates each bin's documents in packing order") {
    import spark.implicits._
    val texts = Seq(
      (0L, "aaaa"), (1L, "bbbbb"), (2L, "ccc"), (3L, "d"), (4L, "ee")
    ).toDF("doc_id", "text")
    // reuse the fixture's token counts (400, 500, 300, 1200, 10)
    val packed = Packing.packSequences(docs, tokens = col("n"), budget = 1000, streams = 1)
    val out = Packing.assembleBins(packed, texts)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // bin 0 starts docs 0,1,2 in offset order; bin 1 doc 3; bin 2 doc 4
    assert(out(0L) == ((3L, 1200L, "aaaa bbbbb ccc")), s"got ${out(0L)}")
    assert(out(1L) == ((1L, 1200L, "d")))
    assert(out(2L) == ((1L, 10L, "ee")))
  }

  test("plan shape: one shuffle (stream hash), no global sort exchange") {
    val plan = Packing.packSequences(docs, col("n"), budget = 1000, streams = 4)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one stream shuffle, got $shuffles:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"packing must not globally sort:\n$plan")
  }
}
