package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries (or all) to files —
  * the plan-evidence artifact for optimization rounds
  * (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q1 q2 ...]
  * Writes <outDir>/<query>_<suffix>.txt per query. Runs at the
  * driver's correctness config (local[4], sf0.01) so plan shape —
  * Exchange count, join strategy, PushedFilters — matches what the
  * oracle gate executes; AQE-final shapes are measured by Bench, this
  * records the declared static plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [queries...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${q}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(plan) finally w.close()
      println(s"[plandump] wrote ${f.getPath} (${plan.length} chars)")
    }
    spark.stop()
  }
}
