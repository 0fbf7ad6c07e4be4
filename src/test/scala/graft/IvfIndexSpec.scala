package graft

import org.apache.spark.sql.functions._

import graft.vector.{IvfIndex, VectorOps}

/** IVF ANN: deterministic training, sane partitioning, recall vs
  * brute force while probing a fraction of the collection. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs =
    graft.io.Tables.table(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("training is deterministic and produces k centroids of full dim") {
    val a = IvfIndex.train(vecs, k = 8, iters = 2)
    val b = IvfIndex.train(vecs, k = 8, iters = 2)
    assert(a === b)
    assert(a.size === 8)
    assert(a.forall(_.vec.size === 64))
    assert(a.map(_.cell).toSet === (0 until 8).toSet)
  }

  test("every vector lands in exactly one cell; cells are non-degenerate") {
    val centroids = IvfIndex.train(vecs, 8, 2)
    val cells = vecs
      .withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.values.sum === vecs.count())
    assert(cells.size >= 4, s"cells collapsed: $cells")
  }

  test("IVF top-k recall vs brute force is high at nProbe=4 of 8 cells") {
    val centroids = IvfIndex.train(vecs, 8, 2)
    val queries = vecs.where($"vec_id" % 100 === 0)
    val brute = VectorOps.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topK(vecs, queries, centroids, nProbe = 4, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    // probing half the cells must not degenerate into scanning all
    val probedCells = 4.0 / 8.0
    assert(ivf.size <= brute.size)
    assert(recall > probedCells * 0.8, s"recall=$recall barely beats random cell scan")
  }

  test("index append: prior postings + map-side batch assignment equals a full assign") {
    // the incremental contract behind q_ann_ivf_incremental: with the
    // quantizer FROZEN on the prior slice, assigning the batch alone
    // and unioning onto the persisted postings must equal assigning
    // the whole collection — no resident row moves, none is lost
    val prior = vecs.where($"vec_id" % 4 =!= 0)
    val batch = vecs.where($"vec_id" % 4 === 0)
    val centroids = IvfIndex.train(prior, 8, 2)
    val appended = IvfIndex.assign(prior, centroids)
      .unionByName(IvfIndex.assign(batch, centroids))
      .select("c_id", "cell").as[(Long, Int)].collect().toMap
    val full = IvfIndex.assign(vecs, centroids)
      .select("c_id", "cell").as[(Long, Int)].collect().toMap
    assert(appended === full)
  }

  test("prior-trained quantizer keeps useful recall over the appended collection") {
    // quality of the daily shape: centroids trained WITHOUT the batch
    // still recall well when the probe spans prior + batch postings
    val prior = vecs.where($"vec_id" % 4 =!= 0)
    val batch = vecs.where($"vec_id" % 4 === 0)
    val centroids = IvfIndex.train(prior, 8, 2)
    val postings = IvfIndex.assign(prior, centroids)
      .unionByName(IvfIndex.assign(batch, centroids))
    val queries = vecs.where($"vec_id" % 100 === 0)
    val brute = VectorOps.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topKOverPostings(postings, queries, centroids, nProbe = 4, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(ivf.size <= brute.size)
  }

  test("semantic dedup drops exactly the higher ids of within-cell dup pairs") {
    val centroids = IvfIndex.train(vecs, 8, 2)
    val r = IvfIndex.semanticDedup(vecs, centroids, 0.45)
    assert(r.count() === vecs.count(), "every vector gets a verdict")
    val dropped = r.where(!col("kept")).select("vec_id")
      .as[Long].collect().toSet
    // oracle-by-construction: the n^2 near-dup pairs restricted to
    // co-located cells predict the dropped set exactly
    val cellOf = vecs
      .withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val expected = VectorOps.nearDupPairs(vecs, 0.45)
      .select("a", "b").as[(Long, Long)].collect()
      .filter { case (a, b) => cellOf(a) == cellOf(b) }
      .map(_._2).toSet
    assert(dropped === expected)
  }
}
