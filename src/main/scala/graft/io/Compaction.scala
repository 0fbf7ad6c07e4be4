package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every
  * long-running ingest needs: streaming sinks and frequent small
  * batches leave thousands of KB-sized parquet files per partition,
  * and at 100 TB the resulting task-per-file scheduling and footer
  * reads dominate scan time long before the data does.
  *
  * `compact` rewrites one directory's files into
  * ceil(bytes / targetFileBytes) files via a single repartition job,
  * writes to a sibling temp dir, and swaps only after the rewrite
  * commits (crash before the swap leaves the original intact). For a
  * partition-structured table, compact the hot partitions
  * individually — that is the unit writers actually fragment.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  def compact(spark: SparkSession, dir: String, targetFileBytes: Long): Stats = {
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(path)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt

    val tmp = new Path(dir + ".compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the rewrite is fully committed before the original moves
    val bak = new Path(dir + ".precompact")
    fs.delete(bak, true)
    require(fs.rename(path, bak), s"could not move $dir aside")
    require(fs.rename(tmp, path), s"could not install compacted $dir")
    fs.delete(bak, true)

    Stats(before.length, dataFiles().length, bytes)
  }
}
