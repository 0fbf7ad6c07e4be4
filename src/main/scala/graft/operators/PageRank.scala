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

  // rounds between eager lineage-truncating checkpoints: deep enough
  // that short power iterations (≤8 rounds) run as ONE pipelined job,
  // shallow enough that Catalyst never plans an unbounded join chain
  private val CheckpointInterval = 8

  /** `edges` must have columns (src, dst) with every node appearing
    * as a src (undirected graphs: union both directions first).
    * Returns (node, degree, mass) after `iters` damped rounds.
    *
    * Two layouts, bit-identical results (integer math is
    * layout-independent; PipelineOpsSpec asserts the equality):
    *
    *  - `broadcastState = true` (default): node state (id, sent) is
    *    |V| rows vs |E| edge rows — broadcast it so the edge list
    *    never shuffles; per-round network traffic is just the
    *    partial-agg'd contribution sums. Right while |V| fits a
    *    broadcast.
    *  - `broadcastState = false`: the GraphX-style co-partitioned
    *    layout for graphs whose node state outgrows broadcast
    *    (billions of nodes). Edges are hash-partitioned AND sorted on
    *    src once before the checkpoint — the checkpoint preserves
    *    partitioning and ordering, so each round's state join shuffles
    *    and sorts ONLY the |V|-row state side; the |E|-row edge list
    *    never moves again and no BroadcastExchange appears in the
    *    loop. */
  def integerPageRank(
      edges: DataFrame,
      iters: Int,
      startMass: Long = 1000000L,
      broadcastState: Boolean = true): DataFrame = {
    // materialize the edge list ONCE — it re-enters the loop every
    // round, and without this each iteration re-runs the caller's
    // whole edge derivation (scan + distinct + union) from scratch
    // (measured 11 s → 4 s at sf0.1 for the lineitem graph)
    val e = (if (broadcastState) edges
             else edges.repartition(col("src")).sortWithinPartitions("src"))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val out = integerPageRankOver(e, deg, iters, startMass, broadcastState)
    // e and deg are THIS function's checkpoints, fully consumed once
    // the final round made the returned state independent
    // (iters == 0 returns a view OVER deg — keep it)
    if (iters > 0) {
      CheckpointBlocks.free(e)
      CheckpointBlocks.free(deg)
    }
    out
  }

  /** The iteration over CALLER-OWNED, already-materialized inputs —
    * for staged snapshot artifacts (e.g. [[graft.queries.GraphStage]]
    * incidences), whose blocks this function must never free: `e` a
    * (src, dst) list with every node appearing as src (pre-positioned
    * on src when `broadcastState = false`), `deg` its (node, degree)
    * aggregate. Both are scanned every round, so non-materialized
    * inputs re-derive per round. */
  /** @param edgesCarryDstDegree the caller guarantees `e` has a
    *   `dst_degree` column holding each dst's degree OVER THIS EDGE
    *   SET and `deg` has `n_in` (incoming count over this edge set) —
    *   staged-artifact metadata (see
    *   [[graft.queries.GraphStage.partSupplierEncodedEdges]]). The
    *   round update then aggregates straight to (node, degree, mass)
    *   grouped by (dst, dst_degree) — degree is functionally
    *   dependent on dst, so groups are identical — and unions the
    *   static no-incoming node set (mass = teleport exactly, since
    *   its `incoming` is always 0) instead of left-joining the degree
    *   table: one broadcast build per round instead of two, no join
    *   in the loop beyond the edge⋈sent probe. Integer masses are
    *   bit-identical to the join shape (round-12 optimization pass;
    *   an explicit flag, not column sniffing, because a FILTERED
    *   artifact carries stale metadata the loop cannot detect). */
  def integerPageRankOver(
      e: DataFrame,
      deg: DataFrame,
      iters: Int,
      startMass: Long = 1000000L,
      broadcastState: Boolean = true,
      init: Option[DataFrame] = None,
      edgesCarryDstDegree: Boolean = false): DataFrame = {
    val teleport = startMass * 15L / 100L
    // WARM START: seed from a prior day's (node, mass) instead of
    // uniform — the incremental refresh after a graph delta (nodes
    // absent from the seed start uniform). Power iteration converges
    // from any start vector; a near-fixpoint seed needs fewer rounds
    // for the same ordering quality, which is the whole point of
    // folding a daily delta instead of re-ranking from scratch.
    var state = init match {
      // explicit select: deg may carry artifact metadata (n_in) that
      // must not leak into the returned state's schema
      case None => deg.select(col("node"), col("degree"),
        lit(startMass).as("mass"))
      case Some(m) => deg
        .join(m.select(col("node"), col("mass").as("init_mass")),
          Seq("node"), "left")
        .select(col("node"), col("degree"),
          coalesce(col("init_mass"), lit(startMass)).as("mass"))
    }
    var spentCps = List.empty[DataFrame]
    var lastCp: Option[DataFrame] = None
    // static across rounds (the graph does not change): nodes with no
    // incoming edge always aggregate incoming = 0, so their mass is
    // exactly `teleport` from round 1 on — a map-side filter over the
    // caller's degree artifact, unioned into each round instead of
    // carried through a join. Empty for any undirected (both-
    // orientations) incidence.
    lazy val noIncoming = deg.where(col("n_in") === 0)
      .select(col("node"), col("degree"), lit(teleport).as("mass"))
    for (i <- 1 to iters) {
      val sent = state.select(col("node").as("src"),
        expr("mass div degree").as("sent"))
      val updated = if (edgesCarryDstDegree) {
        e.join(if (broadcastState) broadcast(sent) else sent, "src")
          .groupBy(col("dst").as("node"), col("dst_degree").as("degree"))
          .agg(sum(col("sent")).as("incoming"))
          .select(col("node"), col("degree"),
            (lit(teleport) + expr("(85 * incoming) div 100")).as("mass"))
          .unionByName(noIncoming)
      } else {
        val contrib = e
          .join(if (broadcastState) broadcast(sent) else sent, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("sent")).as("incoming"))
        deg
          .join(contrib, Seq("node"), "left")
          .select(col("node"), col("degree"),
            (lit(teleport) +
              expr("(85 * coalesce(incoming, 0)) div 100")).as("mass"))
      }
      // state enters the next round's lineage exactly once (via sent),
      // so rounds PIPELINE with no recompute blowup — checkpoint every
      // CheckpointInterval rounds to bound plan depth, not every
      // round: an eager checkpoint is a full materialization job, and
      // one per round costs more than the two pipelined shuffles it
      // replaces (5 iters at sf0.1: 2.7 s → 2.5 s min, 3.4 s → 2.7 s
      // median of 5). The FINAL round
      // always checkpoints so the returned frame is self-contained
      // and everything older can be freed.
      if (i % CheckpointInterval == 0 || i == iters) {
        val cp = updated.localCheckpoint(true)
        lastCp.foreach(spentCps ::= _) // superseded: nothing reads it again
        lastCp = Some(cp)
        state = cp
      } else state = updated
    }
    // spent round checkpoints are dead block sets on every path;
    // e/deg belong to the caller and are never touched here
    CheckpointBlocks.free(spentCps)
    state
  }
}
