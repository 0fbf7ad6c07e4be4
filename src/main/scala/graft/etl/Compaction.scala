package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance job every streaming
  * or daily-append layout needs: micro-batch appends leave thousands
  * of KB-sized part files per partition, and scan cost at 100 TB is
  * dominated by file-open overhead long before bytes matter.
  *
  * Strategy: size the output file count from the actual bytes on
  * disk (`targetBytes` per file, at least one), rewrite with
  * `coalesce` (no shuffle — compaction must not pay a repartition of
  * the whole table), and replace atomically-enough via a temp dir +
  * swap. A table format with transactions (Delta/Iceberg) would do
  * the swap transactionally; plain parquet gets the same layout.
  */
object Compaction {

  /** Bytes of all data files under `path` (driver-side listing — the
    * same listing any planner does). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      // skip metadata AND hidden files: local/Checksum filesystems
      // put a .part-*.crc beside every part file — counting them
      // inflates the estimate and makes compaction emit smaller
      // files than targetBytes promises
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrites `path` (parquet) into ⌈bytes/targetBytes⌉ files.
    * Returns (files before, files after). */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    def fileCount(p: String): Long =
      spark.read.parquet(p).select(input_file_name()).distinct().count()
    val before = fileCount(path)
    val nFiles = math.max(1L, (dataBytes(spark, path) + targetBytes - 1) / targetBytes).toInt
    val tmp = path.stripSuffix("/") + "__compacting"
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-safe swap order: move the original ASIDE (not delete) so
    // a failure between the two renames still leaves a complete copy
    // on disk; only after the rewrite is installed does the old data go
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__precompact")
    fs.delete(bak, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(path), bak), s"could not move $path aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path)),
      s"could not install compacted $path")
    fs.delete(bak, true)
    (before, fileCount(path))
  }
}
