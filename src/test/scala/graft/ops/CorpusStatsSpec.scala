package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental corpus statistics: per-batch mergeable partials whose merged
  * report must equal the one-shot computation — the 100-TB dashboard
  * contract (aggregate |strata|×|batches| rows, never rescan text).
  */
class CorpusStatsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    (0 until 300).map { i =>
      val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh"
      // ~1 in 5 docs duplicates a smaller doc's text exactly
      val base = if (i % 5 == 0) i / 5 else i
      (i.toLong, lang, s"document number $base with some shared words " + ("x " * (base % 7)))
    }.toDF("doc_id", "lang", "text")
  }

  test("merged partials ≡ one-shot partial-path report, for any batch split") {
    def report(batches: Seq[org.apache.spark.sql.DataFrame]): Map[String, org.apache.spark.sql.Row] =
      TextAnalysis.corpusReportFromPartials(
          batches.map(TextAnalysis.corpusPartialStats(_)).reduce(_ union _))
        .collect().map(r => r.getString(0) -> r).toMap
    val oneShot = report(Seq(docs))
    val halves  = report(Seq(docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1)))
    val thirds  = report((0 to 2).map(k => docs.where(col("doc_id") % 3 === k)))
    for (s <- Seq("en", "de", "zh"); split <- Seq(halves, thirds)) {
      assert(split(s) == oneShot(s), s"stratum $s: split report diverged from one-shot")
    }
  }

  test("exact columns match corpusReport; sketch estimate tracks the exact distinct count") {
    val exact = TextAnalysis.corpusReport(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val merged = TextAnalysis.corpusReportFromPartials(
        TextAnalysis.corpusPartialStats(docs.where(col("doc_id") < 150))
          .union(TextAnalysis.corpusPartialStats(docs.where(col("doc_id") >= 150))))
      .collect().map(r => r.getString(0) -> r).toMap
    for (s <- Seq("en", "de", "zh")) {
      val e = exact(s); val m = merged(s)
      assert(m.getLong(1) == e.getLong(1), s"$s n_docs")
      assert(m.getLong(2) == e.getLong(2), s"$s total_tokens")
      assert(m.getDouble(3) == e.getDouble(3), s"$s avg_quality (decimal sum must merge exactly)")
      assert(m.getLong(4) == e.getLong(4), s"$s n_low_quality")
      // HLL at lgK=12 is effectively exact at this cardinality; allow the
      // sketch's documented error band anyway
      val exactDistinct = e.getLong(5).toDouble
      val est = m.getLong(5).toDouble
      assert(math.abs(est - exactDistinct) / exactDistinct < 0.05,
        s"$s distinct: est $est vs exact $exactDistinct")
    }
  }

  test("an appended batch updates the report without touching earlier batches") {
    val b1 = TextAnalysis.corpusPartialStats(docs.where(col("doc_id") < 200))
    // persist the historical partials — the incremental contract is that
    // only the NEW batch's text is read
    val historical = b1.cache()
    historical.count()
    val b2 = TextAnalysis.corpusPartialStats(docs.where(col("doc_id") >= 200))
    val merged = TextAnalysis.corpusReportFromPartials(historical.union(b2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = TextAnalysis.corpusReportFromPartials(TextAnalysis.corpusPartialStats(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == full)
    historical.unpersist()
  }
}
