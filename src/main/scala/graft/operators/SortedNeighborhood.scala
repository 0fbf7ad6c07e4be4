package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking for entity resolution (Hernández &
  * Stolfo 1995): sort the records under a discriminating key, and
  * candidate pairs are exactly those within `w` rank positions of
  * each other — the classic alternative to token blocking
  * ([[graft.operators.FuzzyJoin]]'s deletion neighborhoods) when the
  * similarity signal lives in a sortable prefix (names, addresses,
  * normalized titles).
  *
  * Distributed shape: the global rank comes from [[ExactRank]]'s
  * two-phase range-partitioned pass (NO single-partition window —
  * the engine-wide rule), and the w-window self-join becomes an
  * EQUI-join on rank blocks of width w: a pair with rank gap ≤ w
  * spans at most two consecutive blocks, so the left side emits its
  * block and successor (2 keys/row) and the join hashes on the block
  * id. Each qualifying pair matches on exactly ONE key (its right
  * member's block), so no dedup pass is needed. Shuffle volume is
  * 3|R| key-carrying rows and candidate volume is exactly |R|·w —
  * independent of value skew, which is the property token blocking
  * loses on hot keys. Exact verification (the caller's predicate)
  * runs on candidates only.
  */
object SortedNeighborhood {

  /** Candidate pairs (a.*, b.* prefixed) with 0 < rank(b) − rank(a)
    * ≤ w under the total order `sortKeys` (callers pass a tiebreaker
    * to make it total — ExactRankSpec's contract). */
  def candidatePairs(df: DataFrame, sortKeys: Seq[Column], w: Int)
      : DataFrame = {
    require(w >= 1, s"window must be ≥1, got $w")
    val (ranked, _) = ExactRank.withGlobalRank(df, sortKeys, "__rn")
    val withBlock = ranked.withColumn("__blk", expr(s"(__rn - 1) div $w"))
    val left = withBlock
      .withColumn("__key", explode(array(col("__blk"), col("__blk") + 1)))
    val cols = df.columns
    def side(d: DataFrame, p: String): DataFrame =
      d.select(col("__rn").as(s"${p}__rn") +: col(if (p == "a") "__key" else "__blk").as(s"${p}__key") +:
        cols.map(c => col(c).as(s"${p}_$c")): _*)
    side(left, "a")
      .join(side(withBlock, "b"), col("a__key") === col("b__key") &&
        col("b__rn") > col("a__rn") && col("b__rn") <= col("a__rn") + w)
      .drop("a__key", "b__key", "a__rn", "b__rn")
  }
}
