package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed APPEND tables — the warehouse layout for the store's
  * probe indexes ([[graft.CorpusEtl]]'s `band_index` on
  * (band_idx, band_hash), `content_hashes` on content_md5).
  *
  * Why: the daily near-dup probe joins a day's band rows against the
  * WHOLE history index. Unbucketed, every probe shuffles the index —
  * at 100 TB that is petabytes through the wire per day for an index
  * that never changes layout. Written bucketed on exactly the join
  * key, the index side of the probe plans with ZERO Exchange
  * (BucketedProbeSpec asserts it): the only shuffle left is the
  * day's batch hashing into the index's buckets — O(batch), matching
  * the O(batch) manifest commits.
  *
  * Append-only versioning: each day's rows carry their `batch_id`;
  * "the index as of day N" is `WHERE batch_id <= N` — an append
  * table's natural time travel, no manifest needed. `saveAsTable`
  * with mode=Append preserves the bucket spec (Spark refuses a
  * mismatched one), so every day's files land in the same bucket
  * layout and the probe stays co-located forever. Bucket files
  * accumulate one-per-bucket-per-day; compaction (rewrite with the
  * SAME bucketBy) is the matching maintenance, same as
  * [[graft.etl.ManifestParquet.compact]].
  */
object BucketedTables {

  /** Create-or-replace `name` as an external bucketed table at
    * `path`, bucketed on `keys`. The aligned `repartition` makes the
    * writer hash equal the bucket hash, so each task owns exactly one
    * bucket → one file per bucket per write (BucketingSpec's
    * one-file-per-bucket lesson). */
  def create(df: DataFrame, name: String, path: String, nBuckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(nBuckets, keys.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path).format("parquet")
      .saveAsTable(name)
  }

  /** Append a day's rows in the table's own bucket layout. */
  def append(df: DataFrame, name: String, nBuckets: Int,
      keys: Seq[String]): Unit =
    df.repartition(nBuckets, keys.map(col): _*)
      .write.mode(SaveMode.Append)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
