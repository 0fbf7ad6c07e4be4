package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.VectorOps.dot

/** Product quantization (PQ) ANN — the fourth similarity path next to
  * brute force (exact), LSH (hash buckets) and IVF (coarse cells),
  * and the standard way a billion-vector index fits in memory at all
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; FAISS's `PQx` / `IVFxx,PQx` indexes).
  *
  * The embedding space splits into `m` contiguous subspaces; each
  * subspace trains its own tiny k-means codebook (reusing
  * [[IvfIndex.train]] on the sliced sub-vectors — driver-side,
  * sample-bounded, bit-deterministic); a vector's code is its
  * nearest codeword per subspace. The collection then persists as
  * `m` small ints per vector — at 100 TB that is the difference
  * between an index that fits executor memory (m bytes/vector) and
  * one that re-reads 4·dim bytes/vector from parquet per query
  * batch.
  *
  * Search is ADC (asymmetric distance computation): each QUERY
  * builds a lookup table of distances from its sub-vector to every
  * codeword (m·k distance evaluations, map-only on the tiny query
  * side); a (query, code) pair's distance is then `m` array lookups
  * plus `m−1` adds — the collection's floats are never touched.
  * In the plan: queries broadcast WITH their LUTs; the code table
  * streams; per-pair work is O(m), not O(dim); the custom partial
  * top-k operator keeps only k rows per (query, partition) ahead of
  * the exchange.
  *
  * Determinism (the oracle replays everything in DuckDB SQL):
  * training is [[IvfIndex.train]]'s fixed-order Lloyd loop per
  * subspace; code assignment ties break to the lower codeword id;
  * LUT entries round to 10 decimals before the left-to-right
  * subspace sum, which rounds again — so a last-ulp disagreement
  * can neither flip an assignment nor reorder the ranking.
  */
object PqIndex {

  final case class Codebook(sub: Int, centroids: Seq[IvfIndex.Centroid])

  /** Fail fast on a `dim` inconsistent with the codebooks: without
    * these checks a mismatched caller would silently slice wrong
    * subvectors (a slice past the array end yields truncated/empty
    * arrays, not an error) and produce garbage codes/distances. Same
    * invariants [[train]] establishes. */
  private def checkedSubDim(codebooks: Seq[Codebook], dim: Int): Int = {
    require(codebooks.nonEmpty, "PQ requires at least one codebook")
    require(dim % codebooks.length == 0,
      s"dim $dim not divisible into ${codebooks.length} subspaces")
    val subDim = dim / codebooks.length
    codebooks.foreach { cb =>
      cb.centroids.foreach { c =>
        require(c.vec.length == subDim,
          s"codebook ${cb.sub} centroid length ${c.vec.length} != subspace dim $subDim")
      }
    }
    subDim
  }

  /** 1-based contiguous slice of subspace `sub`. */
  private def subVec(vec: Column, sub: Int, subDim: Int): Column =
    slice(vec, sub * subDim + 1, subDim)

  /** One codebook per subspace, each trained by the shared
    * deterministic k-means trainer over the SLICED sample. */
  def train(vecs: DataFrame, m: Int, k: Int, iters: Int, dim: Int,
      maxSample: Int = 16384): Seq[Codebook] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    (0 until m).map { s =>
      val sliced = vecs.select(col("vec_id"),
        subVec(col("embedding"), s, subDim).as("embedding"))
      Codebook(s, IvfIndex.train(sliced, k, iters, maxSample))
    }
  }

  /** The compressed collection: (vec_id, code0 … code{m−1}) — the
    * only representation search ever reads. Assignment is map-only
    * against broadcast codeword literals (argmin squared distance,
    * ties to the lower codeword id, like [[IvfIndex.assignCell]]). */
  def encode(vecs: DataFrame, codebooks: Seq[Codebook], dim: Int): DataFrame = {
    val subDim = checkedSubDim(codebooks, dim)
    val codes = codebooks.map { cb =>
      IvfIndex.assignCell(subVec(col("embedding"), cb.sub, subDim), cb.centroids)
        .as(s"code${cb.sub}")
    }
    vecs.select(col("vec_id") +: codes: _*)
  }

  /** ADC top-k: per-query LUTs (distance to every codeword per
    * subspace, rounded) travel in the broadcast; the streamed code
    * table contributes only its ints. Returns approximate nearest
    * neighbors ranked by (adc_dist ASC, neighbor_id ASC). */
  def adcTopK(codes: DataFrame, queries: DataFrame, codebooks: Seq[Codebook],
      dim: Int, k: Int): DataFrame = {
    val subDim = checkedSubDim(codebooks, dim)
    val luts = codebooks.map { cb =>
      val qs = subVec(col("embedding"), cb.sub, subDim)
      array(cb.centroids.map { c =>
        val cLit = typedLit(c.vec)
        // ((q·q − 2·q·c) + |c|²) — the assignCell association order
        round(dot(qs, qs) - lit(2.0) * dot(qs, cLit) +
          lit(c.vec.map(x => x * x).sum), 10)
      }: _*).as(s"lut${cb.sub}")
    }
    val q = queries.select(col("vec_id").as("q_id") +: luts: _*)
    // codeword ids are dense 0..k−1 in codebook order, so code m's
    // LUT entry sits at 1-based index code+1
    val pairDist = codebooks
      .map(cb => element_at(col(s"lut${cb.sub}"), col(s"code${cb.sub}") + lit(1)))
      .reduceLeft(_ + _)
    val scored = broadcast(q)
      .join(VectorOps.spread(codes), col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        round(pairDist, 10).as("adc_dist"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq(("adc_dist", true), ("neighbor_id", true)), k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
  }
}
