package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-priori frequent-pair mining and association rules over a
  * (basket, item) relation — market-basket analysis (Agrawal &
  * Srikant 1994), the batch shape behind "users who bought X also
  * bought Y" and, in a corpus pipeline, co-occurring-source /
  * co-cited-domain discovery.
  *
  * Scale shape (100 TB):
  * - The downward-closure prune runs FIRST: an item below `minSup`
  *   cannot participate in a frequent pair, so baskets are
  *   semi-joined to the frequent vocabulary before any pair is
  *   generated. On heavy-tailed data this is the difference between
  *   a pair space over the full vocabulary and one over its head.
  * - Candidate pairs come from a per-basket self-join (equi-join on
  *   `basket`), so generation cost is Σ|basket|² — bounded by basket
  *   size, never |items|². Pair counts partial-aggregate before the
  *   one exchange on the composite (ia, ib) key.
  * - Rule scoring is scalar math on the counts; the top-k by lift is
  *   a TakeOrderedAndProject, never a global sort.
  *
  * All counts are exact integers; confidence/lift are single double
  * divisions of exact counts, so the DuckDB oracle hashes match
  * bit-for-bit.
  */
object AssocRules {

  /** Frequent pairs with both item supports carried.
    *
    * @param baskets distinct (basket, item) rows
    * @param minSup  minimum support for items AND pairs (downward
    *                closure requires itemMinSup <= pairMinSup; using
    *                one threshold keeps the prune lossless)
    */
  def frequentPairs(baskets: DataFrame, minSup: Long): DataFrame = {
    val freq = baskets.groupBy("item")
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSup)
    val pruned = baskets.join(freq, "item")
      .select(col("basket"), col("item"), col("sup"))
    pruned.as("a").join(pruned.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(min(col("a.sup")).as("sup_a"), min(col("b.sup")).as("sup_b"),
        count(lit(1)).as("ps"))
      .filter(col("ps") >= minSup)
  }

  /** Directed rules from the frequent pairs: each undirected pair
    * yields antecedent→consequent both ways, with
    * confidence = sup(pair)/sup(antecedent) and
    * lift = confidence · nBaskets / sup(consequent).
    *
    * @param nBaskets one-row DataFrame with column `n_baskets`
    *                 (kept as a plan node so the scalar never visits
    *                 the driver)
    */
  def rules(pairs: DataFrame, nBaskets: DataFrame, topK: Int): DataFrame = {
    val directed = pairs.select(
        col("ia").as("antecedent"), col("ib").as("consequent"),
        col("ps").as("support"), col("sup_a").as("sup_ante"),
        col("sup_b").as("sup_cons"))
      .unionAll(pairs.select(
        col("ib").as("antecedent"), col("ia").as("consequent"),
        col("ps").as("support"), col("sup_b").as("sup_ante"),
        col("sup_a").as("sup_cons")))
    directed.crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("support"),
        (col("support").cast("double") / col("sup_ante")).as("confidence"),
        (col("support").cast("double") / col("sup_ante")
          * col("n_baskets") / col("sup_cons")).as("lift"))
      .orderBy(col("lift").desc, col("antecedent").asc, col("consequent").asc)
      .limit(topK)
  }
}
