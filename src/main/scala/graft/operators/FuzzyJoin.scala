package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join WITHOUT the n² cross product —
  * the entity-resolution / fuzzy-dedup primitive (near-identical
  * titles, author names, URLs differing by one typo).
  *
  * Algorithm: deletion-neighborhood blocking (the FastSS scheme,
  * Bocek et al. 2007 — public literature). Each string emits its
  * deletion-1 neighborhood — the string itself plus every
  * single-character deletion — as blocking keys; two strings within
  * edit distance 1 ALWAYS share a key (substitution: delete the
  * differing position from both; insert/delete: the short string is
  * itself a deletion variant of the long one), so candidate
  * generation is EXACT, and a per-pair `levenshtein` verify removes
  * the distance-2 false positives (shared variant ⇒ distance ≤ 2).
  * That exactness is what lets the driver hash-gate this against a
  * brute-force DuckDB oracle.
  *
  * Chosen over PassJoin-style segment blocking deliberately: segment
  * keys are substrings of the ORIGINAL, so a corpus whose strings
  * share a long constant prefix (ids, URLs, "Customer#…") collapses
  * one segment block into the full cross product. Deletion variants
  * keep the whole string in the key, so only true near-matches ever
  * collide regardless of shared affixes.
  *
  * Scale: variants explode map-side (len+1 short keys per row — the
  * method is built for short strings: names, titles, URLs; long-text
  * near-dup belongs to MinHash in [[graft.text.TextOps]]); the
  * candidate join is a plain equi-join on the variant value, shuffling
  * keys, never rows², and verify touches candidates only. No block can
  * go hot unless the dataset truly contains that many strings within
  * distance 1 of one key — in which case the output itself is that
  * large.
  */
object FuzzyJoin {

  /** The deletion-neighborhood blocking index: one (id, variant key)
    * row per deletion variant — deliberately WITHOUT the string
    * payload, so the candidate join and the pair-dedup exchange
    * shuffle two ids and a short key, nothing else; strings re-attach
    * in [[selfJoinDist1FromIndex]] only for the rows that reach the
    * verify. A PER-SNAPSHOT derivation — like the shingle/band index,
    * production materializes it once per corpus snapshot
    * ([[graft.queries.DedupStage.customerNameIndex]] stages it) and
    * every fuzzy join over that snapshot pays only join + verify. */
  def deletionIndex(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val s = col(strCol)
    // deletion-1 neighborhood, pure column algebra (codegen'd builtin
    // lambdas, no UDF): s plus s-minus-char-i for every i
    val variants = array_union(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s)))))
    df.select(col(idCol).as("bid"), explode(variants).as("bkey"))
  }

  /** Pairs (a_id < b_id) with `levenshtein(a_str, b_str) <= 1`.
    * Input needs columns `idCol` (unique id) and `strCol`. Output:
    * (a_id, b_id, a_str, b_str, dist). */
  def selfJoinDist1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    selfJoinDist1FromIndex(
      deletionIndex(df, idCol, strCol),
      df.select(col(idCol).as("bid"), col(strCol).as("bstr")))

  /** INDEX rows per verify task: the levenshtein verify's per-row CPU
    * is ~100× a scan row's, so AQE's bytes-based partition coalescing
    * under-parallelizes it badly (measured at sf0.1: the post-dedup
    * attach+verify stage coalesced to 8 tasks on 32 cores — small
    * bytes, high CPU). Callers size [[selfJoinDist1FromIndex]]'s
    * `verifyPartitions` from the blocking-index row count divided by
    * this (a computed value derived from the data, never a
    * config-twiddled task count). Calibrated at sf0.1: candidate
    * pairs ≈ 2× index rows and the verify segment measured ~5 µs/pair
    * ⇒ 8192 index rows ≈ 16k pairs ≈ ~80 ms/task. */
  val VerifyRowsPerTask = 8192L

  /** Verify-stage partition count for an index of `rows` blocking
    * rows: rows/[[VerifyRowsPerTask]], clamped to [1, 16×cores] so a
    * tiny spec input stays 1 task and a 100 TB index cannot mint
    * millions of 1-pair tasks. */
  def verifyPartitionsFor(spark: org.apache.spark.sql.SparkSession,
      rows: Long): Int =
    math.max(1L, math.min(
      (rows + VerifyRowsPerTask - 1) / VerifyRowsPerTask,
      16L * spark.sparkContext.defaultParallelism)).toInt

  /** The join + verify half, over an already-materialized
    * [[deletionIndex]] frame (columns bid, bkey) plus the id→string
    * side table (columns bid, bstr).
    *
    * Stage order is deliberate and MEASURED (sf0.1, structured
    * "Customer#…" names): (1) candidates as an ids-only equi-join on
    * the variant key; (2) `dropDuplicates` on the id pair — this
    * exchange is doing double duty: it removes multi-key duplicates
    * (few) and, critically, REBALANCES the skewed join output (a hot
    * variant key emits its pairs in ONE task; running levenshtein
    * there serializes the whole block — verify-inside-the-join-stage
    * measured 7.0 s vs 1.5 s for this shape); (3) strings re-attach
    * by id (AQE broadcasts a small side table; at scale these are
    * shuffle joins of the pair set, still balanced); (4) the verify
    * runs once per distinct pair on hash-balanced partitions.
    *
    * `verifyPartitions` (round-13): when set, the deduped pair frame
    * is explicitly hash-repartitioned on the pair key to that width
    * before the attach+verify projection. AQE coalesces the dedup
    * exchange by BYTES, but the verify's cost is per-ROW CPU
    * (levenshtein), so the coalesced width starves it; an explicit
    * repartition is exempt from AQE coalescing. The extra exchange
    * carries only deduped (a_id, b_id) pairs — 16 bytes/row. */
  def selfJoinDist1FromIndex(blocked: DataFrame, names: DataFrame,
      verifyPartitions: Option[Int] = None): DataFrame = {
    val keys = blocked.select(col("bid"), col("bkey"))
    val deduped = keys.as("x")
      .join(keys.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.bid") < col("y.bid"))
      .select(col("x.bid").as("a_id"), col("y.bid").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val cand = verifyPartitions.fold(deduped)(n =>
      deduped.repartition(n, col("a_id"), col("b_id")))
    cand
      .join(names.select(col("bid").as("a_id"), col("bstr").as("a_str")), "a_id")
      .join(names.select(col("bid").as("b_id"), col("bstr").as("b_str")), "b_id")
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"),
        // BANDED edit distance: threshold=1 early-exits the DP at
        // O(len·1) per pair instead of O(len²) (returns -1 past the
        // band — exactly the rows the filter drops, and the kept
        // dist values 0/1 equal the unbanded distance, so the oracle
        // is unchanged). The verify IS the work-dominated stage at
        // scale — the second-decade probe measured it linear in
        // pairs, so the constant is what's left to cut (sf1: 11 s →
        // ~2 s for the 9.5M-pair verify).
        levenshtein(col("a_str"), col("b_str"), 1).cast("int").as("dist"))
      .where(col("dist") >= 0)
  }
}
