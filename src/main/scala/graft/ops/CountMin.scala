package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column — the heavy-hitter / frequency-
  * estimation member of the sketch family (HLL distinct, sketch
  * percentiles, Bloom membership, MinHash/SimHash similarity are the
  * others). Build once over the corpus, then estimate any key's frequency
  * from the 8 KB sketch without rescanning — the streaming-friendly
  * "what are the hot tokens/domains/users" primitive.
  *
  * The sketch aggregate ([[org.apache.spark.sql.graft.CountMinAgg]]) takes
  * PRE-HASHED bucket indexes built here from the pluggable [[HashFamily]],
  * so estimates under [[Md5Hash]] are exactly reproducible by an external
  * engine: CMS is a linear sketch, so each counter is a plain group-by sum
  * and the estimate is `min` over `depth` counters — no tolerance gate
  * needed (the driver oracle replicates the counters in SQL).
  *
  * Estimates never undercount; they overcount by collision mass (≤ εN
  * with ε ≈ e/width, probability 1−δ at depth = ln(1/δ)).
  */
object CountMin {

  /** The row's bucket index per sketch row r: `hash_{seed+r}(key) mod width`. */
  def bucketIndexes(key: Column, depth: Int, width: Int, seed: Int = 100,
      hash: HashFamily = XxHash): Column =
    array((0 until depth).map(r => pmod(hash.seeded(seed + r, key), lit(width.toLong))): _*)

  /** One-row frame holding the flattened depth×width sketch of `key`'s
    * occurrence counts as column `cms`.
    */
  def sketch(df: DataFrame, key: Column, depth: Int = 4, width: Int = 256,
      seed: Int = 100, hash: HashFamily = XxHash): DataFrame =
    df.agg(org.apache.spark.sql.graft.CountMinAgg.countMinAgg(
      bucketIndexes(key, depth, width, seed, hash), depth, width).as("cms"))

  /** Point estimate of `key`'s count from a sketch column (same depth /
    * width / seed / hash as the build): `min_r sketch[r·width + bucket_r]`.
    * A `least` over `depth` `element_at` terms — plain codegen, usable
    * after a broadcast of the one-row sketch frame.
    */
  def estimate(sketchCol: Column, key: Column, depth: Int = 4, width: Int = 256,
      seed: Int = 100, hash: HashFamily = XxHash): Column =
    least((0 until depth).map { r =>
      element_at(
        sketchCol,
        (pmod(hash.seeded(seed + r, key), lit(width.toLong)) + lit(r.toLong * width) + 1)
          .cast("int"))
    }: _*)

  /** Equi-join cardinality estimate from two sketches built with the SAME
    * depth/width/seed/hash over each side's join key: the true size is the
    * frequency-vector inner product `Σ_k a_k·b_k`, and because CMS is a
    * linear sketch, each row's counter inner product
    * `Σ_j A[r][j]·B[r][j]` estimates it with the same one-sided guarantee
    * as a point query — collisions only ADD mass, so
    * `min_r Σ_j A[r][j]·B[r][j] >= |A ⋈ B|` always, with expected
    * overshoot ≤ (e/width)·|A|·|B| per row. This is how a planner sizes a
    * join (shuffle vs broadcast, partition count) from two 8 KB sketches
    * WITHOUT running it — the sketches are reusable across any pair of
    * tables sharing the hash configuration.
    *
    * Input: the one-row frames [[sketch]] returns. The per-row products
    * are computed by exploding the depth·width index range over the single
    * crossed row (≤ 1024 rows total — a deliberately tiny intermediate,
    * NOT a per-data-row explode), avoiding both an interpreted HOF and the
    * 64 KB-codegen hazard an unrolled 1024-term sum courts (the q80
    * lesson). Returns one row `(est)` as a long.
    */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame,
      depth: Int = 4, width: Int = 256): DataFrame =
    sketchA.select(col("cms").as("__a"))
      .crossJoin(sketchB.select(col("cms").as("__b")))
      .select(explode(sequence(lit(0), lit(depth * width - 1))).as("i"),
        col("__a"), col("__b"))
      .select((col("i") / lit(width)).cast("int").as("r"),
        (element_at(col("__a"), col("i") + 1) * element_at(col("__b"), col("i") + 1)).as("p"))
      .groupBy(col("r")).agg(sum(col("p")).as("est_r"))
      .agg(min(col("est_r")).as("est"))
}
