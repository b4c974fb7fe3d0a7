package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the entity-resolution / record-
  * linkage step of corpus curation (author names, titles, URLs, product
  * strings): all pairs of rows whose string column is within Levenshtein
  * distance `maxDist`, EXACTLY, without an all-pairs comparison.
  *
  * Candidate generation is deletion-neighborhood blocking (the FastSS /
  * SymSpell "symmetric delete" scheme): every string emits the set of
  * variants reachable by deleting up to `maxDist` characters, and two
  * strings within Levenshtein distance d share at least one variant
  * (take an optimal edit script with k ≤ d operations: each substitution
  * deletes one character from BOTH sides, each insertion one from the
  * right, each deletion one from the left — both sides reach the common
  * remainder with ≤ k deletions). So an equi-join on the variant key has
  * NO false negatives; the verify step re-checks every candidate with the
  * threshold-bounded native `levenshtein` (early-exits past `maxDist`,
  * codegen — never a UDF).
  *
  * 100-TB shape: variant generation is a codegen explode projection
  * (×(len+1) rows per deletion level — O(len^maxDist) growth, which is why
  * `maxDist` is capped at 2; beyond that, block on a coarser key first);
  * the only shuffles are the variant dedup and the variant equi-join.
  * Variant keys of distinct strings are near-distinct, so the join carries
  * no systematic hot key — but m exact copies of one string produce all
  * m·(m−1)/2 distance-0 pairs by definition, so run exact dedup
  * ([[Dedup.exact]]) first on corpora with heavy verbatim duplication.
  * Candidate pairs are deduped on the pair key BEFORE the verify, so each
  * pair pays one Levenshtein evaluation regardless of how many variants it
  * shares.
  */
object FuzzyJoin {

  /** Jaro-Winkler similarity of two string columns (native codegen
    * expression, [[org.apache.spark.sql.graft.JaroWinkler]]; also
    * registered as SQL `jaro_winkler`) — the re-scoring stage of the
    * two-phase entity-resolution shape: block exact and cheap with
    * [[editDistancePairs]], then rank candidates by the finer similarity.
    */
  def jaroWinkler(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.JaroWinklerFunctions.jaroWinkler(a, b)

  /** `(id, s, v)` — every variant `v` of `s` reachable by deleting up to
    * `maxDeletes` characters (including `s` itself), deduped per id.
    */
  def deletionVariants(df: DataFrame, strCol: String, idCol: String,
      maxDeletes: Int): DataFrame = {
    require(maxDeletes >= 1 && maxDeletes <= 2,
      s"maxDeletes must be 1 or 2 (variant count is O(len^d)), got $maxDeletes")
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    var all      = base.withColumn("v", col("s"))
    var frontier = all
    for (_ <- 1 to maxDeletes) {
      // delete the character at position _i+1 (1-based): prefix of _i chars
      // + suffix from _i+2 — plain substring/concat columns, codegen end to
      // end (no higher-order functions: HOF lambdas are interpreted)
      frontier = frontier
        .where(length(col("v")) > 0)
        .select(col("id"), col("s"), col("v"),
          explode(sequence(lit(0), length(col("v")) - 1)).as("_i"))
        .select(col("id"), col("s"),
          concat(
            expr("substring(v, 1, _i)"),
            expr("substring(v, _i + 2, length(v))")).as("v"))
      all = all.union(frontier)
    }
    all.distinct()
  }

  /** All pairs `(id_a, id_b, dist)` with `id_a < id_b` and
    * `levenshtein(s_a, s_b) <= maxDist` — exact (see object doc for the
    * no-false-negative argument).
    */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int = 1): DataFrame = {
    // tracked persist: the variant frame feeds BOTH sides of the self-join
    // and Spark does not CSE common subplans across join branches (the
    // ngramJaccardPairs postings lesson) — without it the explode+distinct
    // runs twice
    val posts = graft.Caches.track(deletionVariants(df, strCol, idCol, maxDist))
    val cand = posts.select(col("id").as("id_a"), col("s").as("_sa"), col("v"))
      .join(posts.select(col("id").as("id_b"), col("s").as("_sb"), col("v")), Seq("v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "_sa", "_sb")
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), maxDist))
      .where(col("dist") =!= -1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Two-table variant of [[editDistancePairs]] — probe a batch against a
    * reference table (incremental entity resolution: "match today's
    * records against the master list"). Both frames carry `strCol`/
    * `idCol`; returns every cross pair `(left_id, right_id, dist)` within
    * `maxDist`, exact by the same deletion-neighborhood lemma. The
    * asymmetric shape is the scale win: variants are generated for the
    * small batch at full depth and the join still prunes against the big
    * side's variants — at 100 TB the reference side's variant table is
    * computed once and persisted (it only changes when the master list
    * does), the same build-once/probe-many discipline as the dedup sketch
    * tables.
    */
  def editDistanceJoin(left: DataFrame, right: DataFrame, strCol: String,
      idCol: String, maxDist: Int = 1): DataFrame = {
    val lv = deletionVariants(left, strCol, idCol, maxDist)
      .select(col("id").as("left_id"), col("s").as("_sl"), col("v"))
    val rv = deletionVariants(right, strCol, idCol, maxDist)
      .select(col("id").as("right_id"), col("s").as("_sr"), col("v"))
    lv.join(rv, Seq("v"))
      .select("left_id", "right_id", "_sl", "_sr")
      .distinct()
      .withColumn("dist", levenshtein(col("_sl"), col("_sr"), maxDist))
      .where(col("dist") =!= -1)
      .select(col("left_id"), col("right_id"), col("dist").cast("long").as("dist"))
  }
}
