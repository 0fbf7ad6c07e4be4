package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The staged co-purchase graph artifacts: the part co-occurrence
  * structure derived from lineitem (two parts co-occur when some
  * order contains both), computed ONCE per corpus snapshot and shared
  * by every graph consumer.
  *
  * Nine registered queries walk these structures (`q_triangles`,
  * `q_link_pred`, `q_kcore`, `q_random_walks`, `q_walk_pairs`,
  * `q_degree_dist` over edges/degrees/adjacency/orientation;
  * `q_assoc_rules` over the pair counts; `q_hits` over the
  * customer–part bipartite incidence; `q_pagerank` over the
  * part–supplier incidence); deriving the structure independently in
  * each — scan → distinct → per-order self-join → wide aggregation —
  * was the dominant cost of each (~1–1.5 s at sf0.1) and would be
  * that many full fact-table passes at 100 TB. A production pipeline
  * materializes the co-occurrence tables once per snapshot as
  * warehouse tables; this object is that seam (the [[StageCache]]
  * contract: versioned [[graft.etl.TableFormat]] tables when a
  * [[StageStore]] root is configured, eager session-lifetime
  * `localCheckpoint` otherwise, build time in `staged_sec`).
  *
  * The root artifact keeps the pair COUNT (n_co = co-occurring
  * orders), not just the pair: the unweighted edge list is a free
  * projection, and support-threshold consumers (association rules)
  * filter the counts instead of re-mining the pair space. Degrees and
  * sorted-neighbor adjacency are one further aggregation each.
  */
object GraphStage {

  private val stage = new StageCache

  def stagedSeconds: Double = stage.stagedSeconds
  private[graft] def clearForTesting(): Unit = stage.clear()
  private[graft] def clearAndFree(): Unit = stage.clearAndFree()
  private[graft] def buildCount: Long = stage.buildCount
  private[graft] def dropMatchingAndFree(sub: String): Int =
    stage.dropMatchingAndFree(sub)

  /** Distinct (o, p) order–part incidence — the bipartite relation
    * the pair table and per-item supports derive from. */
  def basketItems(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "basketItems") {
      Tables.table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .localCheckpoint(true)
    }

  /** (u, v, n_co) with u < v: the number of orders containing both
    * parts, one row per co-occurring pair. Pair counts
    * partial-aggregate before the one exchange on the composite key;
    * generation cost is Σ|basket|², bounded by basket size. */
  def copurchasePairCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = basketItems(spark, dir)
    stage(spark, dir, "pairCounts") {
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("n_co"))
        .localCheckpoint(true)
    }
  }

  /** Undirected co-purchase edge list, one (u, v) row per adjacent
    * part pair with u < v — a free projection over the pair-count
    * artifact (already distinct by construction). Consumers needing
    * both orientations union the swap: a narrow map over the
    * materialized blocks, not a recompute. */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    copurchasePairCounts(spark, dir).select("u", "v")

  /** (node, deg) — each part's co-purchase neighbor count (triangle
    * orientation, k-core seed state, degree distribution all start
    * here). One aggregation over the pair artifact. */
  def copurchaseDegrees(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    stage(spark, dir, "degrees") {
      edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
    }
  }

  /** (node, nbrs) — each part's SORTED neighbor array, the layout
    * random walks index into. One collect_list aggregation over the
    * staged both-orientations list ([[copurchaseDirected]] — shared
    * instead of re-deriving the swap union here). */
  def copurchaseAdjacency(spark: SparkSession, dir: String): DataFrame = {
    val directed = copurchaseDirected(spark, dir)
    stage(spark, dir, "adjacency") {
      directed
        .groupBy("node").agg(sort_array(collect_list(col("nbr"))).as("nbrs"))
        .localCheckpoint(true)
    }
  }

  /** The same adjacency, hash-partitioned on `node` — the
    * co-partitioned layout per-step walk-frontier joins read WITHOUT
    * moving the adjacency, so each step shuffles only the
    * |frontier|-row state (the walk-scale mirror of
    * [[graft.operators.PageRank.integerPageRank]]'s
    * `broadcastState = false` edge layout). Held as an EAGER CACHE,
    * not a checkpoint: a cached plan keeps its declared
    * HashPartitioning visible to Catalyst
    * (`canChangeCachedPlanOutputPartitioning` is off by default, and
    * under AQE a checkpoint's LogicalRDD reports Unknown
    * partitioning — StructureQueriesSpec's exchange-count assert
    * catches the difference). Session-scoped
    * (`persistable = false`): its value IS the in-memory
    * partitioning, which a parquet round-trip would discard; the one
    * positioning shuffle is paid once per snapshot per session. */
  def copurchaseAdjacencyPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val adj = copurchaseAdjacency(spark, dir)
    stage(spark, dir, "adjacencyPartitioned", persistable = false) {
      val positioned = adj.repartition(col("node")).persist()
      positioned.count()
      positioned
    }
  }

  /** Degree-ordered orientation of the co-purchase edges: each
    * undirected edge pointed from its (deg, id)-smaller endpoint, so
    * every node's out-degree is O(√m) and no hub explodes a reducer
    * (Schank & Wagner 2005 node-iterator++). The orientation is a
    * parameter-free derivation of the snapshot — triangle counting,
    * k-truss, clustering coefficients all start here — so it stages
    * like the rest of the graph family. One edges⋈deg⋈deg pass. */
  def copurchaseOriented(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    val deg = copurchaseDegrees(spark, dir)
    stage(spark, dir, "oriented") {
      val withDeg = edges
        .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "udeg"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "vdeg"), "v")
      val ukey = struct(col("udeg").as("d"), col("u").as("n"))
      val vkey = struct(col("vdeg").as("d"), col("v").as("n"))
      withDeg.select(
        when(ukey < vkey, col("u")).otherwise(col("v")).as("src"),
        when(ukey < vkey, col("v")).otherwise(col("u")).as("dst"))
        .localCheckpoint(true)
    }
  }

  /** Per-node SORTED out-neighbor arrays of the oriented graph — the
    * packed adjacency whose per-edge sorted-array intersections
    * enumerate each triangle exactly once (Chiba–Nishizeki shape;
    * arrays bounded O(√m) by the orientation). One collect_list
    * aggregation over [[copurchaseOriented]]. */
  def copurchaseOrientedAdjacency(spark: SparkSession, dir: String): DataFrame = {
    val oriented = copurchaseOriented(spark, dir)
    stage(spark, dir, "orientedAdjacency") {
      oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        .localCheckpoint(true)
    }
  }

  /** (node, n_tri) — each part's triangle participation count, the
    * shared numerator of triangle top-k AND local clustering
    * coefficients (2·tri / deg·(deg−1)). Enumeration is the
    * Chiba–Nishizeki edge-iterator over the staged orientation: each
    * oriented edge (a,b) contributes adj⁺(a) ∩ adj⁺(b) as its
    * triangles, every triangle surfacing exactly once; the corner
    * explode + count is one bounded shuffle on node id. Staged
    * because the intersection pass is the m^{3/2} cost both
    * consumers would otherwise pay per call. */
  def copurchaseTriangleCounts(spark: SparkSession, dir: String): DataFrame = {
    val oriented = copurchaseOriented(spark, dir)
    val adj = copurchaseOrientedAdjacency(spark, dir)
    stage(spark, dir, "triangleCounts") {
      oriented.as("e")
        .join(adj.as("au"), col("e.src") === col("au.src"))
        .join(adj.withColumnRenamed("src", "w").as("av"), col("e.dst") === col("av.w"))
        .select(col("e.src").as("a"), col("e.dst").as("b"),
          explode(array_intersect(col("au.nbrs"), col("av.nbrs"))).as("c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
        .localCheckpoint(true)
    }
  }

  /** (u, v, support) — each co-purchase edge's triangle support
    * (|N(u) ∩ N(v)|), the k-truss seed state and the edge-level
    * twin of [[copurchaseTriangleCounts]]: the SAME degree-ordered
    * triangle stream (oriented edge ⋈ packed out-adjacency,
    * O(√m)-bounded intersections), counted per member EDGE instead
    * of per corner — each triangle explodes its three normalized
    * edges, one bounded shuffle on the edge key, triangle-free edges
    * coalesce to 0. The first cut intersected FULL undirected
    * neighbor lists per edge (symmetric |N(u)∩N(v)|): per-row work
    * scales with raw degree, not the orientation's √m bound, and the
    * 10× probe caught it at 7.3× wall (10.8 s at sf0.1 — Spark's
    * array_intersect also allocates a hash set per row); the
    * triangle-stream form is ~3 s. Staged because the full-graph
    * support pass is the dominant k-truss cost; the peel itself then
    * only maintains DELTAS. */
  def copurchaseEdgeSupport(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    val oriented = copurchaseOriented(spark, dir)
    val adj = copurchaseOrientedAdjacency(spark, dir)
    stage(spark, dir, "edgeSupport") {
      val tri = oriented.as("e")
        .join(adj.as("au"), col("e.src") === col("au.src"))
        .join(adj.withColumnRenamed("src", "w").as("av"), col("e.dst") === col("av.w"))
        .select(col("e.src").as("a"), col("e.dst").as("b"),
          explode(array_intersect(col("au.nbrs"), col("av.nbrs"))).as("c"))
      val triEdges = tri.select(explode(array(
          struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
          struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
          struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
      val nz = triEdges.groupBy("u", "v")
        .agg(count(lit(1)).cast("int").as("support"))
      edges.join(nz, Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("support"), lit(0)).as("support"))
        .localCheckpoint(true)
    }
  }

  /** Both orientations of the co-purchase edges, materialized — the
    * static (node, nbr) list k-core's delta peel joins against every
    * round (deriving it lazily re-unioned two projections of the
    * pair artifact per round). One narrow map + checkpoint per
    * snapshot. */
  def copurchaseDirected(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    stage(spark, dir, "directed") {
      edges.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(edges.select(col("v").as("node"), col("u").as("nbr")))
        .localCheckpoint(true)
    }
  }

  /** The PageRank-ready part–supplier incidence: long-encoded node
    * ids (part k → 2k, supplier k → 2k+1 — every shuffle hashes 8
    * bytes, labels re-attach map-side over the |V|-row result), both
    * directions, materialized once per snapshot. The iteration scans
    * this every round, so staging it removes the per-call encode +
    * union + checkpoint job q_pagerank used to pay. */
  def partSupplierEncodedEdges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = partSupplierPairs(spark, dir)
    stage(spark, dir, "prEdges") {
      val enc = pairs.select((col("p") * 2).as("p"), (col("s") * 2 + 1).as("s"))
      val und = enc.select(col("p").as("src"), col("s").as("dst"))
        .unionByName(enc.select(col("s").as("src"), col("p").as("dst")))
      // dst_degree rides the artifact (round-12 optimization): with
      // the receiver's degree on the edge row, the PageRank round can
      // aggregate straight to (node, degree, mass) and skip the
      // per-round deg join — one degrees aggregation + join HERE,
      // once per snapshot, instead of a broadcast build + join in
      // every round of every invocation. Degrees are over THIS edge
      // set; a caller filtering the artifact must drop the column
      // (it would be stale) and let the loop re-derive degrees.
      val deg = und.groupBy(col("src").as("dst")).agg(count(lit(1)).as("dst_degree"))
      und.join(deg, "dst").select(col("src"), col("dst"), col("dst_degree"))
        .localCheckpoint(true)
    }
  }

  /** (node, degree, n_in) over [[partSupplierEncodedEdges]] — the
    * other per-round input of the PageRank loop. `n_in` (incoming
    * edge count) lets the join-free round shape derive the static
    * no-incoming node set as a map-side filter instead of a per-call
    * anti-join job (for this bidirectional incidence n_in == degree,
    * but the column keeps [[graft.operators.PageRank]]'s fast path
    * correct for any directed artifact built the same way). */
  def partSupplierEncodedDegrees(spark: SparkSession, dir: String): DataFrame = {
    val e = partSupplierEncodedEdges(spark, dir)
    stage(spark, dir, "prDegrees") {
      val out = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
      val in = e.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("n_in"))
      out.join(in, Seq("node"), "left")
        .select(col("node"), col("degree"),
          coalesce(col("n_in"), lit(0L)).as("n_in"))
        .localCheckpoint(true)
    }
  }

  /** "Yesterday's committed ranks": the day-1 (r ≠ 0 subgraph, r =
    * encoded-id sum mod 3) PageRank state the warm-start query seeds
    * from — a snapshot artifact, because in production the prior
    * day's ranks are READ from storage, not recomputed; the daily
    * query pays only its short seeded refresh. */
  def pagerankPriorRanks(spark: SparkSession, dir: String): DataFrame = {
    val e = partSupplierEncodedEdges(spark, dir)
    stage(spark, dir, "prPriorRanks") {
      // drop dst_degree: it is the FULL artifact's degree, stale on
      // this filtered subgraph — the generic entry re-derives degrees
      graft.operators.PageRank.integerPageRank(
        e.where(pmod(col("src") + col("dst"), lit(3)) =!= 0)
          .select(col("src"), col("dst")),
        PipelineQueries.PrIters, PipelineQueries.PrStartMass)
    }
  }

  /** min_sup = the exact ⌈m/denom⌉-th smallest support in the truss
    * seed state (k-core's percentile recipe at the edge level). */
  private[queries] val TrussPctDenom = 50

  /** 1-row (min_sup) snapshot scalar: the truss peel threshold from
    * the support HISTOGRAM (≤ a few hundred distinct values —
    * cumulative counts via a tiny self-join, no sort of the edge
    * table). Staged because it is snapshot-pure and every truss
    * invocation otherwise pays two extra passes over the support
    * artifact to rederive it. */
  def copurchaseTrussThreshold(spark: SparkSession, dir: String,
      denom: Int = TrussPctDenom): DataFrame = {
    val sup0 = copurchaseEdgeSupport(spark, dir)
    stage(spark, dir, s"trussThreshold|d=$denom") {
      val hist = sup0.groupBy(col("support").as("s")).agg(count(lit(1)).as("cnt"))
      hist.as("a").join(hist.as("b"), col("b.s") <= col("a.s"))
        .groupBy(col("a.s").as("s")).agg(sum(col("b.cnt")).as("cum"))
        .crossJoin(broadcast(sup0.agg(count(lit(1)).as("m"))))
        .where(col("cum") >= expr(s"(m + ${denom - 1}) DIV $denom"))
        .agg(min(col("s")).as("min_sup"))
        .localCheckpoint(true)
    }
  }

  /** Distinct (part, supplier) lineitem incidence — the bipartite
    * link-scoring graph PageRank walks (one fact pass + distinct,
    * shared across invocations; consumers encode node ids however
    * their iteration wants — a narrow map over the artifact's
    * blocks). */
  def partSupplierPairs(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "partSupplierPairs") {
      Tables.table(spark, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
        .localCheckpoint(true)
    }

  /** Distinct (c, p) customer–part purchase incidence — the bipartite
    * graph HITS mutual reinforcement walks (one orders⋈lineitem pass
    * + distinct, shared across invocations like every other snapshot
    * artifact here). */
  def purchaseBipartite(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "purchaseBipartite") {
      val orders = Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint(true)
    }

  /** The bipartite incidence pre-positioned on one of its two keys
    * ("c" or "p") — the co-partitioned layouts HITS' alternating
    * state joins read WITHOUT re-exchanging the |E| edge list: each
    * half-round's state arrives already hash-partitioned on the same
    * key (it is the output of a grouped aggregation on it), so the
    * join is exchange-free and only the partial-aggregated state rows
    * ever shuffle. Same eager-cache rationale as
    * [[copurchaseAdjacencyPartitioned]]: the value IS the in-memory
    * HashPartitioning, which a parquet round-trip would discard. */
  def purchaseBipartitePartitioned(spark: SparkSession, dir: String,
      key: String): DataFrame = {
    require(key == "c" || key == "p", key)
    val e = purchaseBipartite(spark, dir)
    stage(spark, dir, s"bipartitePartitioned-$key", persistable = false) {
      val positioned = e.repartition(col(key)).persist()
      positioned.count()
      positioned
    }
  }

  /** This stage's rows in [[Stages.persistableArtifacts]] — keep in
    * sync with every `stage(..)` call above that omits
    * `persistable = false`. */
  private[graft] def persistableArtifacts
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "graph.basketItems" -> (basketItems _),
    "graph.pairCounts" -> (copurchasePairCounts _),
    "graph.degrees" -> (copurchaseDegrees _),
    "graph.adjacency" -> (copurchaseAdjacency _),
    "graph.oriented" -> (copurchaseOriented _),
    "graph.orientedAdjacency" -> (copurchaseOrientedAdjacency _),
    "graph.triangleCounts" -> (copurchaseTriangleCounts _),
    "graph.edgeSupport" -> (copurchaseEdgeSupport _),
    "graph.trussThreshold" -> ((s: SparkSession, d: String) => copurchaseTrussThreshold(s, d)),
    "graph.directed" -> (copurchaseDirected _),
    "graph.prEdges" -> (partSupplierEncodedEdges _),
    "graph.prDegrees" -> (partSupplierEncodedDegrees _),
    "graph.prPriorRanks" -> (pagerankPriorRanks _),
    "graph.purchaseBipartite" -> (purchaseBipartite _),
    "graph.partSupplierPairs" -> (partSupplierPairs _))
}
