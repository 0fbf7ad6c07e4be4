package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.{Load, Maintenance}
import graft.io.MusicCsv
import graft.model.Music.MusicDb
import graft.query.Views

/** Property-based invariants (SURVEY.md §5): upsert idempotence,
  * keep-best-row determinism, rank-delta antisymmetry, retention
  * bound. Small generated inputs, few iterations — each case builds
  * real DataFrames. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in
    * the offline dependency set): n cases from fixed seeds. */
  private def cases[A](g: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    cases(g).foreach(body)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    cases(Gen.zip(ga, gb)).foreach { case (a, b) => body(a, b) }

  private val keyGen = Gen.chooseNum(1, 8)
  private val rowsGen = Gen.listOf(Gen.zip(keyGen, Gen.alphaStr.map(_.take(4))))

  test("upsert is idempotent: re-applying a batch inserts nothing") {
    forAll2(rowsGen, rowsGen) { (existingRows, batchRows) =>
      val existing = existingRows.toDF("k", "v")
        .transform(MusicCsv.keepBestRow(_, Seq("k"), Seq(col("v").asc)))
      val batch = batchRows.toDF("k", "v")
      val (ins1, state1) =
        Load.upsert(existing, batch, Seq(Seq("k")), Seq(col("v").asc))
      val (ins2, state2) =
        Load.upsert(state1, batch, Seq(Seq("k")), Seq(col("v").asc))
      assert(ins2.count() === 0)
      assert(state2.count() === state1.count())
      // state keys = union of key sets
      val want = (existingRows.map(_._1) ++ batchRows.map(_._1)).toSet
      assert(state1.select("k").as[Int].collect().toSet === want)
      assert(ins1.count() === batch.select("k").dropDuplicates()
        .join(existing, Seq("k"), "left_anti").count())
    }
  }

  test("keepBestRow: one row per key, deterministic under input shuffling") {
    forAll(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val shuffled = new scala.util.Random(7).shuffle(rows).toDF("k", "v")
        val a = MusicCsv.keepBestRow(df, Seq("k"), Seq(col("v").asc, col("k").asc))
          .orderBy("k").collect().toSeq
        val b = MusicCsv.keepBestRow(shuffled, Seq("k"), Seq(col("v").asc, col("k").asc))
          .orderBy("k").collect().toSeq
        assert(a === b)
        assert(a.map(_.getInt(0)).distinct.size === a.size)
      }
    }
  }

  private def mkDb(rankings: Seq[(String, String, Int, String)]): MusicDb = {
    val ranking = rankings.map { case (i, d, r, s) => (i, Date.valueOf(d), r, s) }
      .toDF("isrc", "ranking_date", "rank", "ranking_source")
    val isrcs = rankings.map(_._1).distinct
    val song = isrcs.map(i => (i, s"Song $i", 1000, false, s"su$i", Option.empty[String]))
      .toDF("isrc", "song_name", "song_duration_ms", "is_explicit", "spotify_url", "apple_music_url")
    val artist = Seq(("A1", "Art")).toDF("artist_id", "artist_name")
    val map = isrcs.map(i => ("A1", i)).toDF("artist_id", "isrc")
    MusicDb(artist, song, map, ranking)
  }

  private val rankingsGen: Gen[Seq[(String, String, Int, String)]] = for {
    days <- Gen.chooseNum(1, 3)
    perDay <- Gen.chooseNum(1, 5)
  } yield for {
    d <- 0 until days
    r <- 1 to perDay
  } yield (s"I${(r * 7 + d) % perDay + 1}", s"2026-01-0${d + 1}", r, "Spotify")

  test("rank delta between dates is antisymmetric") {
    forAll(rankingsGen) { rows =>
      val db = mkDb(rows.distinct)
      val d1 = Date.valueOf("2026-01-01")
      val d2 = Date.valueOf("2026-01-02")
      val fwd = Views.rankDeltaBetweenDates(db, d1, d2)
        .select("isrc", "delta").as[(String, Int)].collect().toMap
      val bwd = Views.rankDeltaBetweenDates(db, d2, d1)
        .select("isrc", "delta").as[(String, Int)].collect().toMap
      assert(fwd.keySet === bwd.keySet)
      fwd.foreach { case (k, v) => assert(bwd(k) === -v) }
    }
  }

  test("retention: surviving rankings span at most one year before the load date") {
    val gen = for {
      n <- Gen.chooseNum(1, 10)
      offs <- Gen.listOfN(n, Gen.chooseNum(0, 900))
    } yield offs
    forAll(gen) { offsets =>
      val today = java.time.LocalDate.of(2026, 6, 1)
      val rows = offsets.zipWithIndex.map { case (off, i) =>
        (s"I${i + 1}", today.minusDays(off.toLong).toString, i % 10 + 1, "Spotify")
      }
      val db = mkDb(rows)
      val kept = Maintenance.retention(db, Date.valueOf(today.toString))
        .ranking.select(min("ranking_date")).as[Date].collect().headOption.flatMap(Option(_))
      kept.foreach { minDate =>
        assert(!minDate.toLocalDate.isBefore(today.minusYears(1)))
      }
    }
  }
}
