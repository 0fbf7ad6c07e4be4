package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — link-quality scoring for web-crawl
  * curation (a document linked by many well-linked pages outranks
  * orphan spam; the classic signal feeding crawl frontier and
  * quality gates).
  *
  * INTEGER-mass formulation, deliberately: classic double-valued
  * PageRank sums neighbor contributions in shuffle order, and IEEE
  * addition is not associative — two runs (or two engines) can
  * differ in final ulps, which breaks both run-to-run determinism
  * and the DuckDB oracle hash. Here every node starts with
  * `startMass` integer units, sends ⌊mass/degree⌋ units per
  * out-edge, and the damped update is pure integer math:
  * `new = ⌊0.15·start⌋ + (85·incoming) div 100`. Integer sums are
  * associative, so the result is bit-identical under ANY partitioning
  * and replays exactly in SQL. Ranks converge to the same ordering as
  * the float form with ~6 significant digits of mass resolution.
  *
  * Scale: one join + one aggregation per iteration, both shuffling on
  * node id (the state never leaves the cluster); iteration count is
  * fixed (power iteration, not fixpoint detection), and each round
  * ends in `localCheckpoint` to truncate lineage — on a real cluster,
  * `checkpoint()` to reliable storage, same as [[Components]].
  */
object PageRank {

  /** `edges` must have columns (src, dst) with every node appearing
    * as a src (undirected graphs: union both directions first).
    * Returns (node, degree, mass) after `iters` damped rounds. */
  def integerPageRank(edges: DataFrame, iters: Int, startMass: Long = 1000000L): DataFrame = {
    // materialize the edge list ONCE — it re-enters the loop every
    // round, and without this each iteration re-runs the caller's
    // whole edge derivation (scan + distinct + union) from scratch
    // (measured 11 s → 4 s at sf0.1 for the lineitem graph)
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val teleport = startMass * 15L / 100L
    var state = deg.withColumn("mass", lit(startMass))
    var spent = List.empty[DataFrame]
    for (_ <- 1 to iters) {
      // node state (id, sent) is |V| rows vs |E| edge rows — broadcast
      // it so the edge list never shuffles; per-round network traffic
      // is then just the partial-agg'd contribution sums. For graphs
      // whose node state outgrows broadcast (billions of nodes), drop
      // the hint and co-partition edges+state on src instead (the
      // GraphX layout); the integer math is layout-independent.
      val contrib = e
        .join(broadcast(state.select(col("node").as("src"),
          expr("mass div degree").as("sent"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("sent")).as("incoming"))
      val updated = deg
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("degree"),
          (lit(teleport) +
            expr("(85 * coalesce(incoming, 0)) div 100")).as("mass"))
        .localCheckpoint(true)
      spent ::= state
      state = updated
    }
    spent.foreach(_.unpersist())
    e.unpersist()
    state
  }
}
