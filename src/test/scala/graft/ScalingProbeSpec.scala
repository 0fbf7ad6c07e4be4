package graft

/** The PLANS.md 10× scaling probe as an executable gate: the five
  * heavyweight queries must stay ≤5× wall-time when rows grow 10×
  * (sf0.01 → sf0.1). Sub-linear-per-row scaling is the empirical
  * signature that candidate generation stays blocked/bucketed — an
  * accidental n² (a lost equi-key, a broadcast turned nested-loop)
  * shows up here as ~100×, far outside the generous 5× bound that
  * absorbs box variance and fixed overheads.
  *
  * SLOW SUITE: skipped (canceled) unless `GRAFT_SLOW=1` — run at
  * round close, not in the default `sbt test` loop:
  * `GRAFT_SLOW=1 sbt "testOnly graft.ScalingProbeSpec"`. */
class ScalingProbeSpec extends SparkSpec {

  private val heavyweights = Seq(
    "q_dedup_minhash", // MinHash banding + verify (mining scaling probed here)
    "q_fuzzy_join", // deletion-variant blocking
    "q_triangles", // packed-adjacency intersections over the staged edges
    "q_kcore", // histogram threshold + delta-peel rounds
    "q_ktruss", // staged edge support + delta triangle peeling
    "q_pagerank", // iterative integer mass
    "q_cc_incremental", // daily fold: index probe + batch mining + delta CC
    "q_phash_dedup", // perceptual-hash banded join + Hamming verify
    "q_split_dedup_aware", // components consumer over the staged artifact
    "q_containment_prefix", // prefix-filtered candidate join (r9)
    "q_curate_incremental", // two-day fold: gates + index probes (r9)
    "q_kmeans") // full-collection Lloyd: bounded per-round shuffle (r9)

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  test("heavyweight queries stay within 5x wall-time for 10x rows") {
    assume(sys.env.contains("GRAFT_SLOW"),
      "slow probe — run with GRAFT_SLOW=1 at round close")
    // stage the shared dedup artifact at BOTH scales first, so
    // q_split_dedup_aware times its consumer stage at each (the mining
    // itself scales under q_dedup_minhash, which shares the kernel)
    graft.queries.DedupStage.components(spark, small).count()
    graft.queries.DedupStage.components(spark, big).count()
    // the co-purchase pair mining is the graph family's generation
    // cost — time the staged build itself at each scale (consumers
    // q_triangles/q_kcore then probe their own iteration/intersection
    // scaling over the materialized artifact)
    // the staged builds are corpus passes whose cost left the query
    // set when their consumers became cheap — probe each build
    // directly (pair mining for the graph family, the corpus bigram
    // aggregation that q_collocations' PMI mining moved into)
    def buildProbe(label: String)(build: String => Unit): Option[String] = {
      def timed(dir: String): Double = {
        val t0 = System.nanoTime()
        build(dir)
        (System.nanoTime() - t0) / 1e9
      }
      val ts = timed(small)
      val tb = timed(big)
      val ratio = tb / math.max(ts, 0.1)
      info(f"$label%-22s sf0.01=$ts%6.2f s  sf0.1=$tb%6.2f s  ratio=$ratio%4.1f")
      if (ratio > 5.0) Some(f"$label scales $ratio%.1fx for 10x rows") else None
    }
    val stageFailures = Seq(
      buildProbe("graph-stage build")(dir =>
        graft.queries.GraphStage.copurchasePairCounts(spark, dir).count()),
      buildProbe("bipartite build")(dir =>
        graft.queries.GraphStage.purchaseBipartite(spark, dir).count()),
      buildProbe("tri-count build")(dir =>
        graft.queries.GraphStage.copurchaseTriangleCounts(spark, dir).count()),
      buildProbe("edge-support build")(dir =>
        graft.queries.GraphStage.copurchaseEdgeSupport(spark, dir).count()),
      buildProbe("cc-prior build")(dir =>
        graft.queries.DedupStage.corpusSliceLabels(spark, dir).count()),
      buildProbe("lm-stage build")(dir =>
        graft.queries.LmStage.bigramCounts(spark, dir).count()),
      buildProbe("fuzzy-index build")(dir =>
        graft.queries.DedupStage.customerNameIndex(spark, dir).count()),
      buildProbe("pr-prior-ranks build")(dir =>
        graft.queries.GraphStage.pagerankPriorRanks(spark, dir).count()),
      buildProbe("km-prior-state build")(dir =>
        graft.queries.VectorStage.kmPriorState(spark, dir).count())).flatten
    val failures = stageFailures ++ heavyweights.flatMap { name =>
      def minOf2(dir: String): Double = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val ts = minOf2(small)
      val tb = minOf2(big)
      // floor the small time: fixed per-query overhead (session, job
      // setup) would otherwise make sub-100ms queries report noise
      val ratio = tb / math.max(ts, 0.1)
      info(f"$name%-22s sf0.01=$ts%6.2f s  sf0.1=$tb%6.2f s  ratio=$ratio%4.1f")
      if (ratio > 5.0) Some(f"$name scales $ratio%.1fx for 10x rows") else None
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
