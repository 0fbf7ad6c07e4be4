package graft

import org.apache.spark.sql.functions._

import graft.vector.{IvfIndex, PqIndex}

/** Product-quantization semantics: codes are valid codeword ids, ADC
  * distances equal the hand-computed query-to-reconstruction
  * distances, and the end-to-end ranking is deterministic. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val real =
    graft.io.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val cbs = PqIndex.train(real, m = 2, k = 8, iters = 2, dim = dim)

  test("codebooks: one per subspace, codewords span the sliced sample") {
    assert(cbs.map(_.sub) === Seq(0, 1))
    assert(cbs.forall(_.centroids.nonEmpty))
    assert(cbs.forall(_.centroids.forall(_.vec.length === dim / 2)))
  }

  test("codes are dense codeword ids within [0, k)") {
    val codes = PqIndex.encode(real, cbs, dim)
    val bad = codes.where(
      col("code0") < 0 || col("code0") >= 8 || col("code1") < 0 || col("code1") >= 8)
    assert(bad.isEmpty)
    assert(codes.count() === real.count())
  }

  test("ADC distance equals the query-to-codeword sum computed by hand") {
    val codes = PqIndex.encode(real, cbs, dim)
    val queries = real.where(col("vec_id") % 100 === 0)
    val top = PqIndex.adcTopK(codes, queries, cbs, dim, 5)
      .select("query_id", "neighbor_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
    val qVecs = queries.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val codeMap = codes.select("vec_id", "code0", "code1")
      .as[(Long, Int, Int)].collect().map { case (id, c0, c1) => id -> Seq(c0, c1) }.toMap
    def subDist(q: Seq[Float], cen: Seq[Double], off: Int): Double = {
      // the LUT's op order: (q·q − 2·q·c) + |c|², each dot a
      // left-to-right double fold, entry rounded to 10
      val qs = q.slice(off, off + dim / 2).map(_.toDouble)
      val qq = qs.foldLeft(0.0)((a, x) => a + x * x)
      val qc = qs.zip(cen).foldLeft(0.0)((a, p) => a + p._1 * p._2)
      val nsq = cen.map(x => x * x).sum
      BigDecimal((qq - 2.0 * qc) + nsq)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    top.foreach { case (q, n, adc) =>
      val expected = cbs.map { cb =>
        subDist(qVecs(q), cb.centroids(codeMap(n)(cb.sub)).vec, cb.sub * dim / 2)
      }.sum
      val rounded = BigDecimal(expected)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(adc - rounded) < 1e-9, s"query $q neighbor $n")
    }
  }

  test("ranking: 5 rows per query, adc ascending, id tie-break, deterministic") {
    val codes = PqIndex.encode(real, cbs, dim)
    val queries = real.where(col("vec_id") % 100 === 0)
    val a = PqIndex.adcTopK(codes, queries, cbs, dim, 5)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val b = PqIndex.adcTopK(codes, queries, cbs, dim, 5)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq)
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length === 5)
      val sorted = rows.sortBy(_._2).map(r => (r._4, r._3))
      assert(sorted.toSeq === sorted.sortBy(identity).toSeq)
    }
  }

  test("quantization is faithful enough to recover exact self-cells") {
    // a vector that IS a codeword pair must get ADC distance equal to
    // its own quantization error against itself — 0 for a synthetic
    // vector placed exactly on the centroids
    val c0 = cbs(0).centroids.head.vec.map(_.toFloat)
    val c1 = cbs(1).centroids.head.vec.map(_.toFloat)
    val synth = Seq((999999L, (c0 ++ c1))).toDF("vec_id", "embedding")
    val codes = PqIndex.encode(synth, cbs, dim)
    val Seq((code0, code1)) =
      codes.select("code0", "code1").as[(Int, Int)].collect().toSeq
    assert(code0 === cbs(0).centroids.head.cell)
    assert(code1 === cbs(1).centroids.head.cell)
  }
}
