package graft

import org.apache.spark.sql.functions._

import graft.vector.DistributedKMeans

/** Mechanism tests for the full-collection Lloyd trainer: clustering
  * on planted structure, the integer-exactness contract (identical
  * centroids under any partitioning), and the empty-cell rule. */
class DistributedKMeansSpec extends SparkSpec {
  import spark.implicits._

  // two planted clusters around (0, 0) and (10, 10)
  private val vecs = Seq(
    (0L, Seq(0.1f, 0.0f)), (1L, Seq(0.0f, 0.2f)), (2L, Seq(-0.1f, 0.1f)),
    (3L, Seq(10.0f, 9.9f)), (4L, Seq(9.9f, 10.1f)), (5L, Seq(10.1f, 10.0f)),
  ).toDF("vec_id", "embedding")

  test("planted clusters separate and centroids are integer means") {
    val q = DistributedKMeans.quantized(vecs, 1000000L).localCheckpoint(true)
    val cents = DistributedKMeans.train(q, k = 2, iters = 3)
    val cells = DistributedKMeans.assignment(q, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 1L, 2L).map(cells).size === 1)
    assert(Set(3L, 4L, 5L).map(cells).size === 1)
    assert(cells(0L) !== cells(3L))
    // the low cluster's centroid: truncating mean of quantized coords
    val low = cents.find(_.cell == cells(0L)).get
    assert(low.vec === Seq((100000L + 0L - 100000L) / 3, (0L + 200000L + 100000L) / 3))
  }

  test("training is bit-identical under any partitioning") {
    val base = DistributedKMeans.quantized(vecs, 1000000L)
    val a = DistributedKMeans.train(base.repartition(1).localCheckpoint(true), 2, 3)
    val b = DistributedKMeans.train(base.repartition(7).localCheckpoint(true), 2, 3)
    assert(a === b)
  }

  test("online fold: day-2 batch merges into day-1 state, history untouched") {
    import DistributedKMeans._
    val q = DistributedKMeans.quantized(vecs, 1000000L).localCheckpoint(true)
    val cents = train(q, k = 2, iters = 3)
    val day1 = q.where(col("vec_id") <= 2L) // the low cluster
    val day2 = q.where(col("vec_id") > 2L) // the high cluster
    val s1 = stateOf(day1, cents)
    // day-1 saw only the low cluster: the high cell is empty and its
    // implied centroid falls back to the trained seed
    assert(s1.map(_.cnt).sorted === Seq(0L, 3L))
    val emptyCell = s1.find(_.cnt == 0L).get.cell
    assert(centroids(s1).find(_.cell == emptyCell).get.vec ===
      cents.find(_.cell == emptyCell).get.vec)
    val s2 = foldBatch(day2, s1)
    assert(s2.map(_.cnt).toSet === Set(3L, 3L).toSet && s2.map(_.cnt).sum === 6L)
    // merged centroids are the exact truncating means of each cluster
    val c2 = centroids(s2)
    val lowCell = s1.find(_.cnt == 3L).get.cell
    assert(c2.find(_.cell == lowCell).get.vec ===
      Seq((100000L + 0L - 100000L) / 3, (0L + 200000L + 100000L) / 3))
    assert(c2.find(_.cell == emptyCell).get.vec ===
      Seq((10000000L + 9900000L + 10100000L) / 3, (9900000L + 10100000L + 10000000L) / 3))
  }

  test("a cell that loses all members keeps its previous centroid") {
    // seeds 0 and 1 are identical vectors, so every assignment tie
    // breaks to cell 0 and cell 1 goes empty from round 1 — it must
    // keep its seed centroid, and no vector may land in it
    val dup = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(5.0f, 5.0f)), (3L, Seq(5.0f, 5.0f)),
    ).toDF("vec_id", "embedding")
    val q = DistributedKMeans.quantized(dup, 1000000L).localCheckpoint(true)
    val cents = DistributedKMeans.train(q, k = 3, iters = 3)
    assert(cents.map(_.cell) === Seq(0, 1, 2))
    assert(cents.find(_.cell == 1).get.vec === Seq(0L, 0L))
    val cells = DistributedKMeans.assignment(q, cents)
      .select("cell").as[Int].collect().toSet
    assert(cells === Set(0, 2))
  }
}
