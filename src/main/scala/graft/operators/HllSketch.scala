package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog sketches as plain DataFrames — the
  * pre-aggregated "sketch table" pattern (Druid datasketches, Trino
  * `approx_set`/`merge`, BigQuery `HLL_COUNT.*`) with one deliberate
  * difference: the sketch is ENGINE-REPRODUCIBLE. Bucket and rank
  * derive from md5 hex STRING operations (no opaque binary payload,
  * no platform-specific hashing), so any engine with md5 — including
  * the DuckDB oracle — replays the sketch bit-identically, and the
  * sketch table itself is an auditable, diff-able relational artifact.
  *
  * Layout: m = 256 buckets keyed by the first 2 md5 hex chars; rank
  * ρ = leading-zero BITS of the next 13 hex chars (52 bits) + 1,
  * computed from the zero-run length plus a CASE on the first nonzero
  * char. A group's sketch is its ≤256 (bucket, max ρ) rows.
  *
  * Why this scales: `sketch` is an ordinary partial-aggregated
  * groupBy-max — the fact streams through map-side combine and only
  * pre-aggregated sketch rows shuffle; `merge` to any coarser key is
  * a bucket-wise max (associative + commutative), so daily partials
  * roll up in any order, layout, or engine — and the same code runs
  * UNCHANGED over a streaming DataFrame (update/complete-mode max
  * with state intrinsically bounded by groups × 256, the property
  * that makes sketch dashboards viable over unbounded streams).
  *
  * Estimation keeps the harmonic-mean divisor EXACT: Σ 2^(−M[b]) is
  * accumulated as the integer Σ 2^(53−M[b]) (bit shifts; empty
  * buckets contribute 2^53 each), because a float sum of mixed
  * magnitudes rounds and is partition-order-dependent. One double
  * division at the end, plus the standard linear-counting branch
  * below 2.5 m. Standard HLL per Flajolet et al. 2007; ~6.5% σ at
  * m = 256.
  */
object HllSketch {

  val M = 256
  private val TwoP53 = 9007199254740992L // 2^53: empty-bucket term (M = 0)

  /** Appends `bucket` (2 hex chars) and `rho` (long) derived from
    * md5("hll:" ++ key). Map-only; safe on batch and streaming
    * frames. */
  def withBucketRho(df: DataFrame, key: Column): DataFrame = {
    val zr = length(regexp_extract(col("__rest"), "^0*", 0))
    val nextc = col("__rest").substr(zr + lit(1), lit(1))
    val clz4 = when(nextc < "2", 3).when(nextc < "4", 2)
      .when(nextc < "8", 1).otherwise(0)
    val rho = (lit(4) * zr + when(zr === 13, 0).otherwise(clz4) + lit(1))
      .cast("long")
    df
      .withColumn("__h", md5(concat(lit("hll:"), key.cast("string"))))
      .withColumn("bucket", substring(col("__h"), 1, 2))
      .withColumn("__rest", substring(col("__h"), 3, 13))
      .withColumn("rho", rho)
      .drop("__h", "__rest")
  }

  /** The sketch of `df` per `groupCols`: (groupCols..., bucket, m).
    * Works identically on a streaming frame (max is an update-mode
    * streaming aggregate; state ≤ groups × 256 rows). */
  def sketch(df: DataFrame, key: Column, groupCols: Seq[String]): DataFrame =
    withBucketRho(df, key)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m"))

  /** Sketch union to coarser keys: bucket-wise max. Re-aggregable —
    * merge(merge(a, b), c) = merge(a, merge(b, c)) for any grouping
    * of partials. */
  def merge(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    sk.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("m")).as("m"))

  /** Cardinality estimate per `groupCols` from a sketch table:
    * (groupCols..., n_present, est). `est` is the raw double —
    * callers round at their output boundary. */
  def estimate(sk: DataFrame, groupCols: Seq[String]): DataFrame = {
    val zb = lit(M) - col("n_present")
    val sumint = col("s_present") + zb * lit(TwoP53)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val raw = alpha * lit((M.toLong * M).toDouble) * lit(TwoP53.toDouble) /
      sumint.cast("double")
    val est = when(raw <= lit(2.5 * M) && zb > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / zb.cast("double")))
      .otherwise(raw)
    sk.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("est", est)
      .select((groupCols :+ "n_present" :+ "est").map(col): _*)
  }
}
