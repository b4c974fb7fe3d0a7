package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  /** The HuggingFace-tutorial BPE corpus: word counts
    * hug×10 pug×5 pun×12 bun×4 hugs×5 — merge order is hand-computable.
    */
  private def corpus = {
    import spark.implicits._
    val words =
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    // spread words over documents so the word count comes from real corpus
    // tokenization, not one synthetic row
    words.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("bpeMerges learns the textbook merge sequence with deterministic ties") {
    val got = TextAnalysis.bpeMerges(corpus, numMerges = 4)
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // hand-computed: (u,g)=20 → ug; then (u,n)=16 → un; then (h,ug)=15 →
    // hug; then (p,un)=12 → pun
    assert(got.toSeq == Seq(
      (1L, "u", "g", "ug", 20L),
      (2L, "u", "n", "un", 16L),
      (3L, "h", "ug", "hug", 15L),
      (4L, "p", "un", "pun", 12L)))
  }

  test("bpeMerges breaks count ties by symbol text and stops below minPairCount") {
    import spark.implicits._
    val df = Seq((1L, "xy xy xy ab ab ab"), (2L, "qq")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(df, numMerges = 10, minPairCount = 2)
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // (a,b)=3 and (x,y)=3 tie → (a,b) first by symbol text; (q,q)=1 is
    // below minPairCount so learning stops after the two 3-count merges
    assert(got.toSeq == Seq(("a", "b", 3L), ("x", "y", 3L)))
  }

  test("greedy left-to-right non-overlap: 'a a a a' merges to 'aa aa', odd runs leave a tail") {
    import spark.implicits._
    // words: "aaaa"×3 and "aaa"×2 → step-0 pairs (a,a) = 3·3 + 2·2 = 13
    val df = Seq((1L, "aaaa aaaa aaaa aaa aaa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(df, numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(("a", "a", 13L)))
    // encode with that single merge: aaaa → [aa, aa], aaa → [aa, a]
    val enc = df.select(TextAnalysis.bpeEncode(col("text"), Seq("a" -> "a")).as("t"))
      .head().getSeq[String](0)
    assert(enc == Seq("aa", "aa", "▁", "aa", "aa", "▁", "aa", "aa", "▁", "aa", "a", "▁", "aa", "a"))
  }

  test("bpeEncode applies learned merges end-to-end; marker isolates words") {
    val learned = TextAnalysis.bpeMerges(corpus, numMerges = 4)
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    import spark.implicits._
    val enc = Seq((1L, "hug pun hugs bun"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.bpeEncode(col("text"), learned).as("t"))
      .head().getSeq[String](0)
    assert(enc == Seq("hug", "▁", "pun", "▁", "hug", "s", "▁", "b", "un"))
  }

  test("bpePairCounts matches a hand count over the char vocabulary") {
    val pc = TextAnalysis.bpePairCounts(TextAnalysis.bpeVocabulary(corpus))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc == Map(
      ("h", "u") -> 15L, ("u", "g") -> 20L, ("p", "u") -> 17L,
      ("u", "n") -> 16L, ("b", "u") -> 4L, ("g", "s") -> 5L))
  }
}
