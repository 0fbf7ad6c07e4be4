package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Distributed BPE training/application semantics, pinned on
  * hand-computable fixtures (the oracle gate then proves the same
  * semantics against DuckDB's unrolled replay at corpus scale). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      rounds)
      .orderBy("merge_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("merge order follows weighted pair frequency with the fixed tie-break") {
    // "abab" x3 and "ab" x2: pair (a,b) counts 3*2+2 = 8, (b,a) 3;
    // after merging (a,b): "ab ab" / "ab", only pair (ab,ab) = 3
    val got = merges(Seq("abab abab abab", "ab ab"), 2)
    assert(got === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("greedy left-to-right non-overlap: 'aaa' under (a,a) yields [aa, a]") {
    // pair (a,a) in "aaa" counts 2 (overlapping positions), but the
    // MERGE consumes left-to-right: aaa -> [aa, a], so round 2's top
    // pair is (aa, a)
    val got = merges(Seq("aaa aaa"), 2)
    assert(got(0) === (1, "a", "a", 4L))
    assert(got(1) === (2, "aa", "a", 2L))
  }

  test("training stops gracefully when no pairs remain") {
    val got = merges(Seq("ab ab"), 5)
    // round 1 merges (a,b); afterwards every word is one symbol —
    // rounds 2..5 have no pairs and must not throw or emit rows
    assert(got === Seq((1, "a", "b", 2L)))
  }

  test("segmentCounts applies merges in training order and counts tokens per doc") {
    val docs = Seq((1L, "abab ab"), (2L, "ba")).toDF("doc_id", "text")
    val m = Seq(("a", "b"), ("ab", "ab"))
    val got = Bpe.segmentCounts(docs, m)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: "abab" -> [ab,ab] -> [abab] (1 token), "ab" -> [ab] (1)
    // doc 2: "ba" -> [b,a] (merges don't apply) -> 2 tokens
    assert(got === Seq((1L, 2L, 2L), (2L, 1L, 2L)))
  }

  test("oracle SQL generators emit one step per round") {
    val sql = Bpe.bpeOracleSql(3)
    assert(sql.contains("m3 AS MATERIALIZED") && !sql.contains("m4 AS"))
    val seg = Bpe.segmentOracleSql(3)
    assert(seg.contains("d3 AS MATERIALIZED") && seg.contains("FROM d3 GROUP BY"))
  }
}
