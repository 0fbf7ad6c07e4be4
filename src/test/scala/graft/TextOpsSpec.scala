package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Per-operator semantics of the text/dedup family on hand-built
  * corpora with planted duplicates (SURVEY.md §5 + north-star ops). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // 0 and 1: exact duplicates
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    // 2: near-dup of 0 (one token changed late)
    (2L, "the quick brown fox jumps over the lazy cat", "en"),
    // 3: unrelated
    (3L, "completely different words appear here today friends", "en"),
    // 4: reordered version of 3 (same multiset, different order)
    (4L, "friends today here appear words different completely", "en"),
  ).toDF("doc_id", "text", "lang")

  test("token stats: counts and mean length") {
    val r = TextOps.tokenStats(corpus).where($"doc_id" === 0).head()
    assert(r.getAs[Int]("n_tokens") === 9)
    assert(r.getAs[Int]("n_uniq") === 8) // "the" twice
    assert(r.getAs[Int]("n_bpe") === 9)
    assert(math.abs(r.getAs[Double]("mean_token_len") - 35.0 / 9) < 1e-4)
  }

  test("exact dedup groups duplicates under min doc_id") {
    val groups = TextOps.exactDupGroups(corpus)
    assert(groups.count() === 4) // 5 docs, one exact pair
    val dup = groups.where($"n_copies" === 2).head()
    assert(dup.getAs[Long]("canonical_doc_id") === 0L)
  }

  test("fingerprint is order-sensitive where md5 is not") {
    val fp = TextOps.fingerprint(corpus)
      .select("doc_id", "content_md5", "rolling_fp")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(0L) === fp(1L)) // exact dups agree on both
    assert(fp(3L)._1 !== fp(4L)._1)
    assert(fp(3L)._2 !== fp(4L)._2) // reorder changes rolling fp
  }

  test("n-gram Jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = TextOps.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH recovers the exact-jaccard pairs on this corpus") {
    val exact = TextOps.ngramJaccardPairs(corpus, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = TextOps.minhashDupPairs(corpus, 3, 16, 8, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never invent pairs (exact verify)")
    assert(lsh === exact, "with 8 bands the planted pairs must all be recalled")
  }

  test("simhash: identical docs share fingerprints; near-dups within small hamming") {
    val s = TextOps.withSimhash(corpus).select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(0L) === s(1L))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(s(0L), s(2L)) < ham(s(0L), s(3L)))
    val pairs = TextOps.simhashNearPairs(corpus, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("language id votes by stopword sets with fixed tie-break") {
    val docs = Seq(
      (0L, "the cat is on the mat", "en"),
      (1L, "le chat est dans la maison", "fr"),
      (2L, "xyzzy plugh quux", "zz"),
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.langId(docs).select("doc_id", "predicted")
      .as[(Long, String)].collect().toMap
    assert(got(0L) === "en")
    assert(got(1L) === "fr")
    assert(got(2L) === "und")
  }

  test("quality: pure repetition scores below varied text") {
    val docs = Seq(
      (0L, "spam spam spam spam spam spam spam spam", "en"),
      (1L, "a varied sentence with many distinct meaningful words", "en"),
    ).toDF("doc_id", "text", "lang")
    val q = TextOps.qualityScore(docs).select("doc_id", "quality")
      .as[(Long, Double)].collect().toMap
    assert(q(0L) < q(1L))
  }

  test("repetition filters: clean text keeps, degenerate repetition rejects") {
    val docs = Seq(
      (0L, "a b c d e f g h i j k l m n o p q r s t", "en"),
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en"),
      (2L, "x y x y x y x y x y x y x y x y x y x y", "en"),
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.repetitionStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 20 distinct tokens: every fraction at its floor, passes all gates
    assert(r(0L).getAs[Double]("top_unigram_frac") === 0.05)
    assert(r(0L).getAs[Double]("dup_trigram_frac") === 0.0)
    assert(r(0L).getAs[Boolean]("keep"))
    // one token ten times: unigram coverage 1.0, trigrams all dup
    assert(r(1L).getAs[Double]("top_unigram_frac") === 1.0)
    assert(r(1L).getAs[Double]("dup_trigram_frac") === 1.0)
    assert(!r(1L).getAs[Boolean]("keep"))
    // alternating bigram: "x y" appears 10 times in 20 tokens (clamped)
    assert(r(2L).getAs[Double]("top_bigram_frac") === 1.0)
    assert(!r(2L).getAs[Boolean]("keep"))
  }

  test("containment: prefix filtering is lossless vs the n² baseline") {
    // planted subset-duplicate: doc 5 is doc 3's six-token prefix —
    // low Jaccard (4 shared of 5∪4 shingles), containment 4/4 = 1.0
    val planted = corpus.unionByName(Seq(
      (5L, "completely different words appear here today", "en"))
      .toDF("doc_id", "text", "lang"))
    val real = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    for (docs <- Seq(planted, real)) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("n_common"), r.getAs[Double]("cont_ab"),
          r.getAs[Double]("cont_ba"))).toSet
      val base = rows(TextOps.containmentPairs(docs, 3, 0.7))
      val twin = rows(TextOps.prefixContainmentPairsFromKeyed(
        TextOps.prefixOrderedShingles(docs, 3), p = 7, q = 10))
      assert(twin == base && twin.nonEmpty)
    }
  }

  test("exact-substring dedup strips cross-document duplicated spans") {
    val r = TextOps.exactSubstringDedup(corpus, w = 5).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // docs 0/1 are identical: every window duplicated, nothing survives
    assert(r(0L).getAs[Double]("dup_token_frac") === 1.0)
    assert(r(1L).getAs[Double]("dup_token_frac") === 1.0)
    assert(r(0L).getAs[String]("clean_md5")
      === "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    // doc 2 shares its 8-token prefix with 0/1; only "cat" survives
    assert(r(2L).getAs[Long]("n_dup_tokens") === 8L)
    assert(r(2L).getAs[String]("clean_md5")
      === "d077f244def8a70e5ea758bd8352fcd8") // md5("cat")
    // docs 3/4 share a token MULTISET but no 5-token window
    assert(r(3L).getAs[Long]("n_dup_tokens") === 0L)
    assert(r(4L).getAs[Long]("n_dup_tokens") === 0L)
  }

  test("keep-first span dedup: C4 semantics — one canonical copy survives") {
    // 9-token docs at segTokens=5 → spans [t0..t4], [t5..t8]
    val r = TextOps.dedupRewrite(corpus, segTokens = 5).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 0 is the globally-first occurrence of both its spans: intact
    assert(r(0L).getAs[String]("clean_text")
      === "the quick brown fox jumps over the lazy dog")
    assert(r(0L).getAs[Int]("n_removed") === 0)
    // doc 1 duplicates both of doc 0's spans: fully removed (unlike
    // exactSubstringDedup, doc 0's copy is KEPT)
    assert(r(1L).getAs[String]("clean_text") === "")
    assert(r(1L).getAs[Int]("n_removed") === 2)
    // doc 2 shares only the first span ("cat" breaks the second)
    assert(r(2L).getAs[String]("clean_text") === "over the lazy cat")
    assert(r(2L).getAs[Int]("n_removed") === 1)
    assert(r(2L).getAs[Int]("n_segments") === 2)
    // unique docs untouched
    assert(r(3L).getAs[Int]("n_removed") === 0)
    assert(r(4L).getAs[Int]("n_removed") === 0)
    assert(r(3L).getAs[String]("clean_text")
      === "completely different words appear here today friends")
  }

  test("keep-first span dedup: within-doc repeats keep the earliest span") {
    val repeats = Seq(
      (10L, "a b c d e a b c d e x y z w v"), // span 0 == span 1
      (11L, "a b c d e q r s t u")            // span 0 duplicates doc 10's
    ).toDF("doc_id", "text")
    val r = TextOps.dedupRewrite(repeats, segTokens = 5).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(10L).getAs[String]("clean_text") === "a b c d e x y z w v")
    assert(r(10L).getAs[Int]("n_removed") === 1)
    assert(r(11L).getAs[String]("clean_text") === "q r s t u")
  }
}
