package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.DistributedKMeans
import graft.vector.DistributedKMeans.QCentroid

/** Streaming centroid-state maintenance: the per-cell (elementwise
  * sum, count) state of [[DistributedKMeans.foldBatch]] kept live as
  * vectors ARRIVE, instead of once per daily batch — the online
  * k-means split the engine uses everywhere else (dedup band index,
  * PSI counters, HLL sketches): assignment is a STATELESS map against
  * the day's fixed centroids (re-training stays a daily batch job,
  * exactly like the LSH band index the document stream probes), and
  * only the mergeable sufficient statistics are stateful.
  *
  * State is bounded at k × (dim + 1) longs TOTAL — flattened to
  * (cell, pos) keyed long sums so Spark's streaming aggregation holds
  * it without a custom state class, no watermark needed (the key
  * space never grows). Sums of longs are order-independent, so after
  * ANY micro-batch split of the same vectors the final per-cell state
  * is IDENTICAL to one [[DistributedKMeans.stateOf]] batch pass —
  * StreamingSpec asserts bit-equality, and the merged state feeds
  * [[DistributedKMeans.centroids]]/`foldBatch` unchanged.
  */
object StreamingKMeans {

  /** (cell, pos, s, cnt) per arriving vector batch — complete-mode
    * aggregation over a (vec_id, embedding) stream: quantize (the
    * batch [[DistributedKMeans.quantized]] expression), argmin-assign
    * against the centroid literals map-side, then fold the
    * posexploded coordinates into the running per-(cell, pos) sums. */
  def cellStateStream(vecs: DataFrame, cents: Seq[QCentroid],
      scale: Long): DataFrame = {
    // assign in its OWN projection, posexplode in the next: a
    // generator sharing a select with the argmin makes the analyzer's
    // generator extraction re-resolve the struct AFTER alias cleanup,
    // and getField("cell") then fails on col1/col2 field names —
    // splitting the projections keeps each resolution single-pass
    DistributedKMeans.quantized(vecs, scale)
      .select(DistributedKMeans.assignCell(col("qv"), cents).as("cell"),
        col("qv"))
      .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
  }

  /** The batch-side flattening a final emission compares against:
    * [[DistributedKMeans.stateOf]]'s cells as (cell, pos, s, cnt)
    * rows, empty cells omitted (a key the stream never saw holds no
    * state row either). */
  def flatten(state: Seq[DistributedKMeans.CellState]): Seq[(Int, Int, Long, Long)] =
    state.filter(_.cnt > 0L).flatMap(s =>
      s.sum.zipWithIndex.map { case (x, i) => (s.cell, i, x, s.cnt) })
}
