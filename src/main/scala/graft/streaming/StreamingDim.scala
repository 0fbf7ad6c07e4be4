package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.io.MusicCsv
import graft.operators.Scd2

/** Continuous SCD2 dimension maintenance: update events stream in,
  * and each micro-batch merges into the persisted dimension through
  * the SAME batch operator ([[Scd2.merge]]) — stream/batch parity by
  * construction, the pattern every "streaming upsert to a dimension"
  * pipeline reduces to.
  *
  * Storage is behind (load, store) thunks: tests hold a variable, a
  * deployment does a Compaction-style temp-dir swap of the dimension
  * parquet (or a transactional table format's MERGE). foreachBatch
  * gives at-least-once batch delivery; the merge is idempotent for
  * replayed batches (re-applying the same updates changes nothing:
  * no-op change detection mints no versions), which upgrades the sink
  * to effectively-once.
  */
object StreamingDim {

  /** `precedence` picks THE winning update when a key appears several
    * times in one micro-batch (e.g. `Seq(col("upd_ts").desc)` — latest
    * wins): an explicit total order, never arrival order, so a
    * replayed batch resolves to the same row and stays idempotent. */
  def scd2Sink(
      updates: DataFrame,
      key: Seq[String], tracked: Seq[String],
      precedence: Seq[Column],
      effectiveOfBatch: Long => Column)(
      load: () => DataFrame, store: DataFrame => Unit): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = MusicCsv.keepBestRow(batch, key, precedence)
          .select((key ++ tracked).map(org.apache.spark.sql.functions.col): _*)
        store(Scd2.merge(load(), b, key, tracked, effectiveOfBatch(id)))
      }
}
