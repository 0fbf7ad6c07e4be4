package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps.dot

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * collection into cells; queries probe only the nProbe nearest
  * cells and rank those candidates exactly. The third similarity
  * path next to brute force (exact) and LSH (hash buckets), and the
  * standard billion-scale layout (FAISS-style IVF-Flat).
  *
  * Deterministic by construction: seeded initialization from fixed
  * vec_ids, a fixed iteration count, and ties broken by cell id —
  * reproducible across runs and cluster sizes.
  *
  * Scale: training touches the (optionally sampled) collection a few
  * times (assign = map-only vs broadcast centroids; update = one
  * narrow shuffle on (cell, dim)); centroids are tiny driver state
  * (k × dim doubles). Search joins each query to nProbe cells only —
  * candidate count ≈ nProbe/k of the collection.
  */
object IvfIndex {

  final case class Centroid(cell: Int, vec: Seq[Double])

  /** Squared-distance argmin over broadcast centroid literals:
    * |v|² − 2·v·c + |c|² ranked as (dist, cell) struct-min. */
  private def nearestCells(vec: Column, centroids: Seq[Centroid], probes: Int): Column = {
    val scored = array(centroids.map { c =>
      val cLit = typedLit(c.vec)
      val dist = dot(vec, vec) - lit(2.0) * dot(vec, cLit) + lit(c.vec.map(x => x * x).sum)
      struct(dist.as("d"), lit(c.cell).as("cell"))
    }: _*)
    slice(array_sort(scored), 1, probes)
  }

  def assignCell(vec: Column, centroids: Seq[Centroid]): Column =
    nearestCells(vec, centroids, 1)(0).getField("cell")

  /** Lloyd's k-means with deterministic seeding (every ⌈n/k⌉-th
    * vector by id) and a fixed iteration count. Centroids are the
    * small driver-side index state — the legitimate driver loop. */
  def train(vecs: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    val n = vecs.count()
    val step = math.max(n / k, 1L)
    val seedRows = vecs
      .withColumn("__rn", row_number().over(Window.orderBy(col("vec_id").asc)) - 1)
      .where(col("__rn") % step === 0)
      .limit(k)
      .select(col("embedding"))
      .collect()
    var centroids = seedRows.zipWithIndex.map { case (r, i) =>
      Centroid(i, r.getSeq[Float](0).map(_.toDouble))
    }.toSeq
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cell", assignCell(col("embedding"), centroids))
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(avg(col("v")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("cell"), col("dims.m").as("vec"))
        .collect()
        .map(r => Centroid(r.getInt(0), r.getSeq[Double](1)))
        .toSeq
      // cells can empty out; keep the previous centroid for those
      val byCell = updated.map(c => c.cell -> c).toMap
      centroids = centroids.map(c => byCell.getOrElse(c.cell, c))
    }
    centroids
  }

  /** IVF search: candidates = vectors in the query's nProbe nearest
    * cells; exact cosine ranks them. */
  def topK(vecs: DataFrame, queries: DataFrame, centroids: Seq[Centroid], nProbe: Int, k: Int): DataFrame = {
    val c = vecs.select(
      col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      VectorOps.l2norm(col("embedding")).as("c_norm"),
      assignCell(col("embedding"), centroids).as("cell"))
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorOps.l2norm(col("embedding")).as("q_norm"),
      explode(nearestCells(col("embedding"), centroids, nProbe).getField("cell")).as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(c, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(
        col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 10)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
