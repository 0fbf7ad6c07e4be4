package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Components, Sessionize}

/** As-of join, sessionization, and connected-components semantics:
  * the edge cases the oracle queries can't isolate (inclusive-ts
  * matching, exact gap boundaries, transitive chains). */
class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join: latest at-or-before wins, inclusive ts, left keeps unmatched") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two rights → latest wins
      (2L, 10L, ts("2024-01-01 08:00:00")), // exactly at a right ts → inclusive
      (3L, 10L, ts("2024-01-01 06:00:00")), // before any right → null
      (4L, 20L, ts("2024-01-01 10:00:00")), // other key isolated
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 07:00:00"), "r7"),
      (10L, ts("2024-01-01 08:00:00"), "r8"),
      (20L, ts("2024-01-01 09:00:00"), "r9"),
    ).toDF("user_id", "ts", "payload")
    val got = AsofJoin.joinAsOf(left, right, Seq("user_id"), "ts")
      .orderBy("event_id")
      .select("event_id", "payload", "asof_ts")
      .collect()
    assert(got(0).getString(1) == "r8" && got(0).getTimestamp(2) == ts("2024-01-01 08:00:00"))
    assert(got(1).getString(1) == "r8") // inclusive: right at same instant matches
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    assert(got(3).getString(1) == "r9")
  }

  test("sessionize: gap strictly over threshold splits; exact gap does not") {
    val gapUs = 30L * 60 * 1000000
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:30:00")), // exactly 30 min → same session
      (3L, 1L, ts("2024-01-01 11:00:01")), // 30 min 1 s → new session
      (4L, 2L, ts("2024-01-01 10:00:00")), // other user → own session 1
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessionize(e, "user_id", "ts", "event_id", gapUs)
      .orderBy("user_id", "event_id")
      .select("event_id", "session_seq").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 1), (2L, 1), (3L, 2), (4L, 1)))
    val stats = Sessionize.sessionStats(e, "user_id", "ts", "event_id", gapUs)
      .where(col("user_id") === 1 && col("session_seq") === 1)
      .select("n_events", "duration_sec").as[(Long, Long)].head()
    assert(stats == ((2L, 1800L)))
  }

  test("connected components: transitive chains merge, islands stay apart") {
    val edges = Seq(
      (5L, 3L), (3L, 9L), // chain {3,5,9} → component 3
      (7L, 8L),           // pair {7,8} → component 7
      (11L, 11L),         // self-loop → singleton 11
    ).toDF("a", "b")
    val got = Components.connectedComponents(edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 3L), (5L, 3L), (7L, 7L), (8L, 7L), (9L, 3L), (11L, 11L)))
  }

  test("connected components: long path needs multiple rounds, still converges") {
    // path 1-2-3-...-8: diameter 7 forces several propagation rounds
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == (1L to 8L).map(i => (i, 1L)))
  }

  test("incremental components equal a full recompute, including cross-component bridges") {
    // old graph: {1,2,3} (label 1), {10,11} (label 10), {20,21} (label 20)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val oldLabels = Components.connectedComponents(oldPairs)
    // delta: a new chain 11—30—3 BRIDGES {1,2,3} and {10,11}; a pair
    // inside {20,21} is a structural no-op; {40,41} is a new-only clique
    val newPairs = Seq((11L, 30L), (30L, 3L), (20L, 21L), (40L, 41L)).toDF("a", "b")
    val got = Components.incremental(oldLabels, newPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Components.connectedComponents(oldPairs.unionByName(newPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == full)
    // the merged super-component took the global min label
    assert(got(11L) == 1L && got(30L) == 1L && got(10L) == 1L)
    assert(got(20L) == 20L && got(40L) == 40L)
  }

  test("table diff: added/removed/changed classified; unchanged and null-variant rows distinct") {
    val before = Seq(
      (1L, Option("a"), Option("x")), // unchanged
      (2L, Option("b"), Option("y")), // changed
      (3L, Option("c"), Option.empty[String]), // removed
      (5L, Option.empty[String], Option("v")), // null -> "" must register as changed
    ).toDF("k", "p", "q")
    val after = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("B"), Option("y")),
      (4L, Option("d"), Option("w")), // added
      (5L, Option(""), Option("v")),
    ).toDF("k", "p", "q")
    val got = graft.operators.TableDiff.diff(before, after, Seq("k"), Seq("p", "q"))
      .select("k", "kind").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added", 5L -> "changed"))
  }

  test("dedup-aware split: near-dup pairs never straddle splits; all splits populated") {
    val dir = "/root/testdata/sf0.001"
    val split = graft.queries.AdvancedQueries.q_split_dedup_aware(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val pairs = graft.text.TextOps.minhashDupPairs(
      graft.io.Tables.table(spark, dir, "documents"), 3, 16, 8, 0.5)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"leakage: $a(${split(a)}) vs $b(${split(b)})")
    }
    assert(split.values.toSet == Set("train", "val", "test"))
    val trainFrac = split.values.count(_ == "train").toDouble / split.size
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("interval merge: overlapping and touching spans collapse, long spans swallow short ones") {
    val in = Seq(
      // k=1: [0,10) [5,15) overlap; [15,20) touches → ONE island 0..20
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L),
      // k=1: gap then [25,30)
      (1L, 25L, 30L),
      // k=2: long [0,100) swallows [10,20) and [50,60) — lag(end)
      // alone would wrongly split at 50
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 50L, 60L),
    ).toDF("k", "s", "e")
    val got = graft.operators.Intervals.mergeOverlapping(in, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .select("k", "island_start", "island_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L), (2L, 0L, 100L, 3L)))
  }

  test("connected components: pointer jumping makes rounds logarithmic in diameter") {
    // path 1-2-...-64: diameter 63 — propagation alone would need 63
    // rounds (overrunning the default 20-round bound); label-of-label
    // shortcutting doubles reach per round, so log2(63)+slack suffice
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Components.connectedComponentsWithStats(edges)
    val got = labels.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == (1L to 64L).map(i => (i, 1L)))
    assert(rounds <= 10, s"expected <= 10 rounds on a 64-chain, took $rounds")
  }
}
