package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.VectorOps.dot

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * collection into cells; queries probe only the nProbe nearest
  * cells and rank those candidates exactly. The third similarity
  * path next to brute force (exact) and LSH (hash buckets), and the
  * standard billion-scale layout (FAISS-style IVF-Flat).
  *
  * Deterministic by construction: seeded initialization from fixed
  * vec_ids, a fixed iteration count, fixed-order arithmetic, and
  * ties broken by cell id — reproducible across runs and cluster
  * sizes.
  *
  * Scale: the coarse quantizer trains driver-side on a bounded
  * deterministic sample (the FAISS recipe — index state is k × dim
  * doubles, so the cluster never runs per-iteration jobs); cell
  * ASSIGNMENT of the full collection is map-only against broadcast
  * centroid literals. Search joins each query to nProbe cells only —
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

  /** Lloyd's k-means over a bounded, deterministic sample (the first
    * `maxSample` vectors by id), iterated driver-side: coarse-
    * quantizer training state is k × dim doubles, and training it on
    * a sample is the standard IVF recipe (FAISS trains its quantizer
    * on a capped sample regardless of collection size) — so the
    * cluster never runs per-iteration assign/update jobs, only the
    * one `TakeOrderedAndProject` that fetches the sample. Seeding is
    * every ⌈n/k⌉-th sample vector; empty cells keep their previous
    * centroid; all arithmetic is in fixed vec_id order, so training
    * is bit-reproducible across runs and cluster layouts. */
  def train(vecs: DataFrame, k: Int, iters: Int, maxSample: Int = 16384): Seq[Centroid] = {
    val sample: Array[Array[Double]] = vecs
      .orderBy(col("vec_id").asc)
      .limit(maxSample)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = sample.length
    require(n > 0, "cannot train IVF on an empty collection")
    val dim = sample(0).length
    val step = math.max(n / k, 1)
    var centroids = (0 until k)
      .flatMap { i =>
        val idx = i.toLong * step
        if (idx < n) Some(Centroid(i, sample(idx.toInt).toSeq)) else None
      }
    for (_ <- 0 until iters) {
      val cents = centroids.map(_.vec.toArray).toArray
      val cells = centroids.map(_.cell).toArray
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        // argmin squared distance, ties to the smaller cell id (the
        // same order assignCell's (dist, cell) struct-sort produces)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Centroid(cells(c), sums(c).map(_ / counts(c)).toSeq)
      }
    }
    centroids
  }

  /** Collection rows assigned to their nearest cell — the posting
    * table an IVF index PERSISTS: (c_id, c_emb, c_norm, cell).
    * Map-only against broadcast centroid literals, so appending a
    * daily batch to a committed index costs O(batch × k) with zero
    * shuffle and zero touch of the resident postings. */
  def assign(vecs: DataFrame, centroids: Seq[Centroid]): DataFrame =
    vecs.select(
      col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      VectorOps.l2norm(col("embedding")).as("c_norm"),
      assignCell(col("embedding"), centroids).as("cell"))

  /** IVF search: candidates = vectors in the query's nProbe nearest
    * cells; exact cosine ranks them. */
  def topK(vecs: DataFrame, queries: DataFrame, centroids: Seq[Centroid], nProbe: Int, k: Int): DataFrame =
    topKOverPostings(assign(vecs, centroids), queries, centroids, nProbe, k)

  /** The probe over an ALREADY-ASSIGNED posting table ([[assign]]'s
    * schema) — the search path a persisted index serves: the caller
    * unions yesterday's committed postings with today's map-side
    * batch assignment and never re-assigns the resident collection. */
  def topKOverPostings(postings: DataFrame, queries: DataFrame, centroids: Seq[Centroid], nProbe: Int, k: Int): DataFrame = {
    val c = postings
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorOps.l2norm(col("embedding")).as("q_norm"),
      explode(nearestCells(col("embedding"), centroids, nProbe).getField("cell")).as("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(
        col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 10)
          .as("cosine"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq(("cosine", false), ("neighbor_id", true)), k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its k-means cell, then
    * search duplicate pairs WITHIN cells only — cosine ≥ threshold
    * drops the higher vec_id, so each semantic-duplicate chain keeps
    * its minimal element. Output: (vec_id, cell, kept) for every
    * input vector.
    *
    * Scale: this is the paper's point — pair search is Σ|cell|²
    * instead of n², and with k sized so cells hold ~thousands of
    * vectors (k ≈ n/4000 in the paper) each cell's quadratic
    * verification fits one task. Assignment is map-only against
    * broadcast centroid literals; the pair join shuffles on cell, the
    * dedup verdict joins back on vec_id. */
  def semanticDedup(vecs: DataFrame, centroids: Seq[Centroid], threshold: Double): DataFrame = {
    val assigned = vecs.select(
      col("vec_id"), col("embedding"),
      VectorOps.l2norm(col("embedding")).as("nrm"),
      assignCell(col("embedding"), centroids).as("cell"))
    val left = assigned.select(col("cell"), col("vec_id").as("a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val right = assigned.select(col("cell"), col("vec_id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    // round(10) before the threshold test: the same guard every other
    // cosine gate here uses, so an engine's last-ulp difference can't
    // flip a borderline pair
    val dups = left.join(right, Seq("cell"))
      .where(col("a") < col("b") &&
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 10)
          >= threshold)
      .select(col("b").as("vec_id")).distinct()
    assigned
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup").isNull.as("kept"))
  }
}
