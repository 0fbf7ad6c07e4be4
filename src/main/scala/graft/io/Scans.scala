package graft.io

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-width hygiene for heavy per-row compute above narrow reads. */
object Scans {

  /** Hash-repartition `df` to cluster core width when its current
    * layout is narrower (guide §2.5 — repartition immediately after a
    * narrow read when real per-row work follows): a single-file
    * parquet snapshot scans at 1–3 tasks, and any expensive
    * projection above it (shingling, hashing, feature extraction)
    * serializes there. At scale a table scan already carries more
    * partitions than cores, so this is a no-op exactly where the
    * extra exchange would be waste; the key keeps the repartition
    * deterministic (a keyless round-robin also pays a local
    * sort-before-repartition, SPARK-23207). */
  def widenIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores, key)
  }
}
