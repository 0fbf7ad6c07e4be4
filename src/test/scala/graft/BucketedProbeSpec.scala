package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.io.BucketedTables
import graft.text.{Curation, TextOps}

/** Cashes in the promise in [[graft.CorpusEtl]]'s scaladoc: at
  * warehouse scale the `band_index` probe table is written BUCKETED
  * on (band_idx, band_hash), and the daily near-dup probe join then
  * plans with ZERO Exchange on the index side — the only shuffle is
  * the day's batch hashing into the index's bucket layout, O(batch).
  * Also proves the layout survives daily APPENDS (same bucket spec)
  * and that the curation fold over the bucketed index is bit-equal to
  * the plain fold. */
class BucketedProbeSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Curation.Config()
  private val docs: DataFrame =
    graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")
  private lazy val mid = docs.agg(max($"doc_id")).head().getLong(0) / 2
  private lazy val history = docs.where($"doc_id" <= mid)
  private lazy val batch = docs.where($"doc_id" > mid)

  private val table = "graft_band_index_bucketed"
  private val path = "/tmp/graft_bucketed_probe/band_index"
  private val keys = Seq("band_idx", "band_hash")
  private val nBuckets = 8

  private def bands(d: DataFrame): DataFrame =
    TextOps.lshBandRows(d, cfg.shingleN, cfg.minhashK, cfg.minhashBands)

  /** Walk the executed tree (through AQE wrappers), collecting nodes
    * matched by `pick`. */
  private def collectNodes[T](p: SparkPlan)(pick: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    pick.lift(p).toSeq ++ kids.flatMap(collectNodes(_)(pick))
  }

  private def bucketedScans(p: SparkPlan) =
    collectNodes(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec if f.bucketedScan => f
    }

  /** The probe side that scans the bucketed table must carry no
    * shuffle; the batch side carries exactly one (into the bucket
    * layout). */
  private def assertIndexSideCoLocated(df: DataFrame): Unit = {
    df.collect() // finalize AQE
    val joins = collectNodes(df.queryExecution.executedPlan) {
      case j: SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a sort-merge probe join:\n${df.queryExecution.executedPlan}")
    val j = joins.head
    val (indexSide, batchSide) =
      if (bucketedScans(j.left).nonEmpty) (j.left, j.right)
      else (j.right, j.left)
    assert(bucketedScans(indexSide).nonEmpty,
      s"index side should be a bucketed scan:\n${df.queryExecution.executedPlan}")
    assert(countShuffles(indexSide) == 0,
      s"the index side of the probe must not shuffle:\n$indexSide")
    assert(countShuffles(batchSide) == 1,
      s"the batch side should shuffle once, into the bucket layout:\n$batchSide")
  }

  test("day-1 write: probe join has zero Exchange on the bucketed index side, same answer") {
    BucketedTables.create(
      bands(history).withColumn("batch_id", lit(1L)), table, path, nBuckets, keys)
    val idx = BucketedTables.read(spark, table).drop("batch_id")
    val br = bands(batch)
    val (probe, want) = withoutAutoBroadcast {
      (TextOps.minhashDupAgainstIndexFromBands(idx, br, cfg.nearDupThreshold),
        TextOps.minhashDupAgainstIndexFromBands(bands(history), br, cfg.nearDupThreshold))
    }
    withoutAutoBroadcast { assertIndexSideCoLocated(probe) }
    assert(rowsOf(probe.orderBy("a", "b")) == rowsOf(want.orderBy("a", "b")))
    assert(probe.count() > 0, "the sf0.001 corpus has cross-half near-dups")
  }

  test("daily appends keep the bucket layout: day-2 rows land co-located, probe still exchange-free") {
    // append day 2 into the same table (Spark enforces the matching
    // bucket spec), then probe with a synthetic day 3
    BucketedTables.append(
      bands(batch).withColumn("batch_id", lit(2L)), table, nBuckets, keys)
    val idx = BucketedTables.read(spark, table)
    assert(idx.where($"batch_id" === 2L).count() > 0)
    // as-of read: the append table's time travel is a batch_id filter
    assert(idx.where($"batch_id" <= 1L).count() == bands(history).count())

    val day3 = docs.where($"doc_id" % 7 === 3)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val probe = withoutAutoBroadcast {
      TextOps.minhashDupAgainstIndexFromBands(
        idx.drop("batch_id"), bands(day3), cfg.nearDupThreshold)
    }
    withoutAutoBroadcast { assertIndexSideCoLocated(probe) }
    val want = withoutAutoBroadcast {
      TextOps.minhashDupAgainstIndexFromBands(
        bands(docs), bands(day3), cfg.nearDupThreshold)
    }
    assert(rowsOf(probe.orderBy("a", "b")) == rowsOf(want.orderBy("a", "b")))
  }

  test("the curation fold over the bucketed index is bit-equal to the plain fold") {
    // day-1 state with the band index resolved from the BUCKETED
    // table — the warehouse-mode FoldState — must produce day-2 flags
    // identical to the plain in-memory state
    val evalDocs = docs.where($"doc_id" % cfg.evalModulus === 0)
    val plainState = Curation.curateFold(history,
      Curation.initState(evalDocs, cfg), cfg)._2
    val bucketedState = plainState.copy(
      bandIndex = BucketedTables.read(spark, table)
        .where($"batch_id" === 1L).drop("batch_id")
        .select(plainState.bandIndex.columns.map(col).toSeq: _*))
    val (plainFlags, _) = Curation.curateFold(batch, plainState, cfg)
    val (bucketedFlags, _) = Curation.curateFold(batch, bucketedState, cfg)
    assert(rowsOf(bucketedFlags) == rowsOf(plainFlags))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
