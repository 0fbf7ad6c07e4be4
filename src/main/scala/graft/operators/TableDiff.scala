package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two table versions
  * as `added` / `removed` / `changed` — the migration-validation and
  * anti-entropy primitive (did the backfill change anything it
  * shouldn't? what did yesterday's load actually touch?).
  *
  * Comparison is by a canonical row digest over the compared columns
  * (null-tagged, so NULL ≠ '' ≠ 'null'), computed map-side per side —
  * the join then carries (key, 32-byte digest) instead of full rows,
  * which at wide-row scale is the difference between shuffling
  * hashes and shuffling the table. Unchanged keys drop out before
  * the result materializes.
  */
object TableDiff {

  /** One row per differing key: `kind` ∈ added|removed|changed plus
    * both sides' digests (null on the absent side). */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String], compare: Seq[String]): DataFrame = {
    def digest(df: DataFrame): DataFrame = {
      val tagged: Seq[Column] = compare.map(c =>
        when(col(c).isNull, lit(" null")).otherwise(col(c).cast("string")))
      df.select(keys.map(col) :+ md5(concat_ws("", tagged: _*)).as("__digest"): _*)
    }
    val b = digest(before)
    val a = digest(after)
    b.withColumnRenamed("__digest", "before_digest")
      .join(a.withColumnRenamed("__digest", "after_digest"), keys, "full_outer")
      .withColumn("kind",
        when(col("before_digest").isNull, lit("added"))
          .when(col("after_digest").isNull, lit("removed"))
          .when(col("before_digest") =!= col("after_digest"), lit("changed")))
      .where(col("kind").isNotNull)
      .select(keys.map(col) :+ col("kind") :+ col("before_digest") :+ col("after_digest"): _*)
  }
}
