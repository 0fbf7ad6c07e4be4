package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators: the steps between a curated
  * corpus and the tensors a trainer reads — deterministic global
  * shuffle, sharding, sequence packing into fixed token budgets, and
  * mixture upsampling. All are pure column algebra (md5-keyed, no
  * RNG state), so every run — and the DuckDB oracle — produces the
  * identical assignment.
  */
object TrainingMix {

  /** Deterministic shuffle + shard + pack: documents are (1) shuffled
    * by a salted md5 order key (training wants decorrelated order,
    * not crawl order), (2) sharded by an independent md5 nibble —
    * shard ↔ output file, and (3) greedily packed WITHIN each shard
    * into bins of ≈`budget` tokens by exclusive-prefix-sum binning:
    * bin = ⌊(prefix_sum − own_tokens) / budget⌋. Each bin overflows
    * its budget by at most one document (the assign-by-prefix-sum
    * relaxation of bin packing — one distributed pass, no sequential
    * first-fit state).
    *
    * Scale: the only non-map step is the per-shard prefix sum — a
    * window partitioned BY SHARD, so parallelism = shard count and no
    * global sort exists anywhere. The shard key is the first
    * `shardNibbles` hex chars of the shard hash: 1 nibble = 16 shards
    * (the oracle-readable default), 4 nibbles = 65k shards — the 100 TB
    * setting that keeps every partition bounded while the assignment
    * stays deterministic (the per-doc assignment depends only on
    * doc_id, not on the shard count's effect on any other doc).
    *
    * Output: (doc_id, shard, n_tokens, bin, pos) — pos is the
    * document's position inside its bin. */
  def packSequences(docs: DataFrame, budget: Int, shardNibbles: Int = 1): DataFrame = {
    val t = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
      substring(md5(concat(lit("shard:"), col("doc_id").cast("string"))),
        1, shardNibbles).as("shard"),
      md5(concat(lit("ord:"), col("doc_id").cast("string"))).as("okey"))
    val cumW = Window.partitionBy(col("shard"))
      .orderBy(col("okey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = t
      .withColumn("cum", sum(col("n_tokens")).over(cumW))
      .withColumn("bin", expr(s"(cum - n_tokens) div $budget"))
    val posW = Window.partitionBy(col("shard"), col("bin"))
      .orderBy(col("okey").asc, col("doc_id").asc)
    binned.select(
      col("doc_id"), col("shard"), col("n_tokens"), col("bin"),
      row_number().over(posW).as("pos"))
  }

  /** Mixture upsampling: repeat each document `n_copies` times
    * according to its mixture weight (here: language tier — the
    * "epochs per source" dial every pretraining mix has). Explode of
    * a generated sequence — map-side only, no shuffle, no driver
    * loop; a copy index is carried so downstream global shuffles
    * decorrelate the copies. */
  def upsample(docs: DataFrame): DataFrame = {
    val nCopies = when(col("lang") === "en", lit(3))
      .when(col("lang").isin("de", "fr"), lit(2))
      .otherwise(lit(1))
    docs
      .select(col("doc_id"), col("lang"), nCopies.as("n_copies"))
      .select(col("doc_id"), col("lang"), col("n_copies"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
  }
}
