package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the real core count (the target box is local[32]);
    // SPARK_GRAFT_CPUS still overrides for reproducibility runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup (codegen, parquet footer reads) so the first
    // timed query isn't charged ~5s of JVM bring-up
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.io.Tables.names.foreach(n =>
      graft.io.Tables.table(spark, sfDir, n).limit(1).count())
    // min over `reps` runs per query: the box this runs on shows heavy
    // cross-tenant contention (identical runs swing 1.5×, spikes land
    // on random queries), and min-of-warm-runs is the standard way to
    // report the code's own cost rather than the neighbours'
    // Opt-in warehouse bench (SPARK_GRAFT_BENCH_WAREHOUSE=<root>):
    // staged artifacts persist as versioned TableFormat tables under
    // the given root. Measures COLD resolution (build + parquet
    // commit) vs WARM (the cross-JVM read a fresh driver would pay)
    // by resolving every persistable artifact, clearing the session
    // memos, and resolving again — then the query loop below runs on
    // the warm store. Artifact values are bit-equal to the in-process
    // path by construction (StageStoreSpec), so query hashes are
    // unchanged. The driver never sets the env, so driver benches
    // keep the session-lifetime checkpoint default.
    val stagedColdWarm = sys.env.get("SPARK_GRAFT_BENCH_WAREHOUSE").map { root =>
      import graft.queries.{StageStore, Stages}
      StageStore.setForTesting(sfDir, root)
      // the single registry each stage object contributes to — a new
      // persistable artifact is covered here (and in StageStoreSpec)
      // without touching Bench
      def resolveAll(): Unit =
        Stages.persistableArtifacts.foreach { case (_, build) =>
          build(spark, sfDir).count()
        }
      def timed(f: => Unit): Double =
        { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val cold = timed(resolveAll())
      val afterCold = Stages.stagedSecondsTotal
      // drop the memos — exactly the state a new driver JVM starts
      // without — so the second resolve measures the store read path
      Stages.clearAllForTesting()
      val warm = timed(resolveAll())
      // the warm resolve accrues into the stage adders too; subtract
      // it from the reported staged_sec so that field keeps meaning
      // "one-time cost paid this session" in both bench modes
      val warmAccrued = Stages.stagedSecondsTotal - afterCold
      (cold, warm, warmAccrued)
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated name filter for per-query iteration
    // (the driver never sets it, so driver benches stay full-suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // a failed query must be LOUD, not a short time-to-exception that
    // SHRINKS the total (a regression would read as a speedup — the
    // round-5 failure mode in the other entry point): failures are
    // collected, emitted in the JSON tail, and fail the run
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      (name, times.head, median)
    }
    def r3(x: Double): String =
      BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // per-query times at 1 ms precision: the driver archives only the
    // LAST 2000 chars of this line (BENCH_r03 lost the min total to
    // front-truncation), so the map is kept compact and every headline
    // scalar sits AFTER it — `value` dead last, guaranteed in-tail
    val qs = results.map { case (k, mn, _) => s"\"" + k + "\":" + r3(mn) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // median alongside min: run-to-run variance on this box exceeds
    // any plausible regression, so regressions are judged on min and
    // sanity-checked against median
    val medianTotal = results.map(_._3).sum
    // staged-artifact build time (DedupStage mining + LmStage
    // scoring): paid once per session, so min-of-reps drops it from
    // every query — report it separately instead of hiding it
    val staged = graft.queries.Stages.stagedSecondsTotal -
      stagedColdWarm.map(_._3).getOrElse(0.0)
    val warehouseFields = stagedColdWarm
      .map { case (c, w, _) => s""""staged_cold_sec":${r3(c)},"staged_warm_sec":${r3(w)},""" }
      .getOrElse("")
    // errors sit in the guaranteed-archived tail, right before value
    val errField =
      if (failed.isEmpty) ""
      else s""""errors":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"""
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"agg":"min",$warehouseFields"staged_sec":${r3(staged)},"median_total":${r3(medianTotal)},$errField"value":${r3(total)}}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
