package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.DoubleAdder

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffolding for corpus-snapshot staged artifacts
  * ([[DedupStage]], [[LmStage]], [[GraphStage]]): memoize a built,
  * eagerly-materialized frame per (session, snapshot dir, artifact),
  * and account the one-time build wall-clock so Bench can report it
  * (`staged_sec`) instead of min-of-reps hiding it.
  *
  * Artifacts are deliberately session-lifetime: a corpus snapshot is
  * immutable, so there is no invalidation story beyond the session
  * ending with its blocks.
  *
  * CONTRACT for builders that depend on other artifacts: resolve the
  * dependency BEFORE calling [[apply]] — `computeIfAbsent` is not
  * reentrant, and a nested call on the same map throws a recursive-
  * update error. Build times use a [[DoubleAdder]], so concurrent
  * builds of different artifacts never lose an increment. */
private[graft] final class StageCache {

  private val cache = new ConcurrentHashMap[String, DataFrame]()
  private val secs = new DoubleAdder()

  def stagedSeconds: Double = secs.sum()

  /** Drop all staged artifacts (testing only) — DeterminismSpec uses
    * this so the BUILD stage re-runs under each partitioning, not
    * just its consumers. */
  def clear(): Unit = cache.clear()

  /** Build-once per (session, dir, artifact id — include any build
    * parameters in `what`). */
  def apply(spark: SparkSession, dir: String, what: String)(
      build: => DataFrame): DataFrame = {
    val key = s"${spark.sparkContext.applicationId}|$dir|$what"
    cache.computeIfAbsent(key, _ => {
      val t0 = System.nanoTime()
      val built = build
      secs.add((System.nanoTime() - t0) / 1e9)
      built
    })
  }
}
