package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 merge edge semantics: no-op updates mint no version, null
  * transitions do, history rows pass through untouched. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private val eff = lit("2024-06-01").cast("date")

  private val dim = Seq(
    // k=1: open row whose value will change
    (1L, Option("A"), d("2024-01-01"), Option.empty[Date]),
    // k=1 history: already-closed row must pass through untouched
    (1L, Option("OLD"), d("2023-01-01"), Option(d("2024-01-01"))),
    // k=2: open row with a no-op update
    (2L, Option("B"), d("2024-01-01"), Option.empty[Date]),
    // k=3: open row, no update at all
    (3L, Option("C"), d("2024-01-01"), Option.empty[Date]),
    // k=4: NULL -> value transition must version
    (4L, Option.empty[String], d("2024-01-01"), Option.empty[Date]),
    // k=6: retired key — all versions closed, no current row
    (6L, Option("F"), d("2023-01-01"), Option(d("2023-06-01"))),
    // k=7: retired key closed AFTER the effective date — the re-open
    // must start at the closed valid_to, not inside its validity
    (7L, Option("G"), d("2024-01-01"), Option(d("2024-12-31"))),
  ).toDF("k", "v", "valid_from", "valid_to")

  private val updates = Seq(
    (1L, Option("A2")), (2L, Option("B")), (4L, Option("D")),
    (5L, Option("E")), // brand-new key -> insert as open version
    (6L, Option("F2")), // retired key -> re-open
    (7L, Option("G2")), // retired key with future valid_to -> re-open at it
  ).toDF("k", "v")

  private lazy val out = Scd2.merge(dim, updates, Seq("k"), Seq("v"), eff)
    .orderBy(col("k").asc, col("valid_from").asc)
    .select("k", "v", "valid_from", "valid_to", "is_current")
    .as[(Long, Option[String], Date, Option[Date], Boolean)]
    .collect().toSeq

  test("changed key closes the old row and opens a new current one") {
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, Some("OLD"), d("2023-01-01"), Some(d("2024-01-01")), false),
      (1L, Some("A"), d("2024-01-01"), Some(d("2024-06-01")), false),
      (1L, Some("A2"), d("2024-06-01"), None, true)))
  }

  test("no-op update and missing update mint no versions") {
    assert(out.filter(_._1 == 2L) == Seq((2L, Some("B"), d("2024-01-01"), None, true)))
    assert(out.filter(_._1 == 3L) == Seq((3L, Some("C"), d("2024-01-01"), None, true)))
  }

  test("null-to-value transition versions (null-safe change detection)") {
    assert(out.filter(_._1 == 4L) == Seq(
      (4L, None, d("2024-01-01"), Some(d("2024-06-01")), false),
      (4L, Some("D"), d("2024-06-01"), None, true)))
  }

  test("brand-new key inserts as an open version") {
    assert(out.filter(_._1 == 5L) == Seq((5L, Some("E"), d("2024-06-01"), None, true)))
  }

  test("retired key (no current row) re-opens; its history is untouched") {
    assert(out.filter(_._1 == 6L) == Seq(
      (6L, Some("F"), d("2023-01-01"), Some(d("2023-06-01")), false),
      (6L, Some("F2"), d("2024-06-01"), None, true)))
  }

  test("re-open never lands inside a closed version's validity range") {
    assert(out.filter(_._1 == 7L) == Seq(
      (7L, Some("G"), d("2024-01-01"), Some(d("2024-12-31")), false),
      (7L, Some("G2"), d("2024-12-31"), None, true)))
  }
}
