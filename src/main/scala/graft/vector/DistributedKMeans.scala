package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd k-means trained over the FULL distributed collection — the
  * companion to [[IvfIndex.train]]'s bounded driver-side sample (the
  * FAISS recipe). Sample training is the right default for a coarse
  * ANN quantizer, but semantic clustering for mixture balancing /
  * SemDeDup cell sizing sometimes needs centroids fit on everything;
  * this is that path, shaped for a 1000-executor cluster:
  *
  *  - Centroids are DRIVER state (k × dim longs — tiny); the data
  *    never moves. Per iteration exactly ONE Spark job: assignment is
  *    a map-only argmin against broadcast centroid literals, and the
  *    elementwise centroid update is a (cell, pos)-keyed aggregation
  *    whose map-side partials bound the shuffle at
  *    partitions × k × dim rows — independent of collection size.
  *  - INTEGER-exact arithmetic, deliberately (the [[graft.operators
  *    .PageRank]] argument): float centroid means sum in shuffle
  *    order, and IEEE addition is not associative — two runs could
  *    differ in final ulps and flip an argmin. Coordinates quantize
  *    ONCE to `round(x·scale)` longs (the [[graft.queries
  *    .AdvancedQueries]] q_vec_quantize cross-engine convention);
  *    distances are long sums; the centroid mean is truncating long
  *    division (Scala `/` = Spark `div` = DuckDB `//` — all toward
  *    zero). Results are bit-identical under ANY partitioning and
  *    replay exactly in the DuckDB oracle, with ~6 decimal digits of
  *    coordinate resolution.
  *  - Seeding needs no global sort: cell c starts at the
  *    minimum-vec_id vector with `vec_id % k = c` — one aggregation.
  *  - Ties (equidistant centroids) break to the smaller cell id,
  *    matching [[IvfIndex.assignCell]]'s (dist, cell) struct order.
  *  - Empty cells keep their previous centroid, like the sampled
  *    trainer.
  */
object DistributedKMeans {

  final case class QCentroid(cell: Int, vec: Seq[Long])

  /** (vec_id, qv): coordinates quantized to `round(x·scale)` longs.
    * Callers materialize this once — the iteration scans it every
    * round. */
  def quantized(vecs: DataFrame, scale: Long): DataFrame =
    vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * scale).cast("long")).as("qv"))

  /** Integer squared distance to one centroid literal. */
  def dist2To(v: Column, cent: QCentroid): Column =
    aggregate(
      zip_with(v, typedLit(cent.vec), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, d) => acc + d)

  /** Argmin cell over centroid literals, ties to the smaller cell. */
  def assignCell(v: Column, cents: Seq[QCentroid]): Column =
    array_min(array(cents.map(c =>
      struct(dist2To(v, c).as("d"), lit(c.cell).as("cell"))): _*))
      .getField("cell")

  /** The per-vector (cell, dist2) against trained centroids —
    * map-only; the final scoring pass of [[train]]'s caller. */
  def assignment(q: DataFrame, cents: Seq[QCentroid]): DataFrame = {
    val best = array_min(array(cents.map(c =>
      struct(dist2To(col("qv"), c).as("d"), lit(c.cell).as("cell"))): _*))
    q.select(col("vec_id"), best.getField("cell").as("cell"),
      best.getField("d").as("dist2"))
  }

  /** Per-cell running (elementwise sum, count) — the MERGEABLE state
    * behind incremental and streaming centroid maintenance: sums are
    * order-independent longs, so state from any partitioning, any
    * batch split, or any day merges to the same value. `seed` is the
    * centroid the cell falls back to while empty (the trained
    * centroid it was derived from). */
  final case class CellState(cell: Int, sum: Seq[Long], cnt: Long,
      seed: Seq[Long])

  /** Centroids a state implies: truncating mean, empty cell → seed. */
  def centroids(state: Seq[CellState]): Seq[QCentroid] =
    state.map(s => QCentroid(s.cell,
      if (s.cnt == 0L) s.seed else s.sum.map(_ / s.cnt)))

  /** One assignment job reduced to state: per-cell (sum, cnt) of `q`
    * under `cents` (map-only assign + the same bounded
    * partitions×k×dim shuffle as a [[train]] round). */
  def stateOf(q: DataFrame, cents: Seq[QCentroid]): Seq[CellState] = {
    val upd = q
      .withColumn("cell", assignCell(col("qv"), cents))
      .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
      .collect()
    val byCell = upd.groupBy(_.getInt(0))
    cents.map { c =>
      byCell.get(c.cell) match {
        case Some(rows) => CellState(c.cell,
          rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq,
          rows.head.getLong(3), c.vec)
        case None => CellState(c.cell, c.vec.map(_ => 0L), 0L, c.vec)
      }
    }
  }

  /** ONLINE (mini-batch) k-means fold: assign `batch` against the
    * centroids the state currently implies, and merge the batch's
    * per-cell partials in — earlier days' assignments never revisit
    * (the incremental-CC contract applied to centroids: history is
    * touched only through its k×dim-long state, one job per day).
    * Deterministic and split-order-defined; the streaming twin
    * ([[graft.streaming.StreamingKMeans]]) maintains the identical
    * state with arbitrary micro-batch splits. */
  def foldBatch(batch: DataFrame, state: Seq[CellState]): Seq[CellState] = {
    val upd = stateOf(batch, centroids(state)).map(s => s.cell -> s).toMap
    state.map { s =>
      val u = upd(s.cell)
      CellState(s.cell, s.sum.lazyZip(u.sum).map(_ + _), s.cnt + u.cnt, s.seed)
    }
  }

  /** `iters` Lloyd rounds over `q` ([[quantized]] — must be
    * materialized by the caller; it is scanned once per round). */
  def train(q: DataFrame, k: Int, iters: Int): Seq[QCentroid] = {
    val seedRows = q
      .groupBy(pmod(col("vec_id"), lit(k.toLong)).cast("int").as("cell"))
      .agg(min(struct(col("vec_id"), col("qv"))).as("s"))
      .select(col("cell"), col("s").getField("qv").as("qv"))
      .collect()
    var cents: Seq[QCentroid] = seedRows
      .map(r => QCentroid(r.getInt(0), r.getSeq[Long](1))).sortBy(_.cell).toSeq
    // one job per round: [[stateOf]]'s assign+partial-agg; the
    // empty-cell rule (keep previous centroid) is [[centroids]]'s
    // seed fallback, seeded here with the round's input centroids
    for (_ <- 1 to iters) cents = centroids(stateOf(q, cents))
    cents
  }
}
