package graft

import org.apache.spark.sql.functions._

import graft.etl.{CommitLogTable, TableFormat, VersionedParquet}

/** MERGE-shaped contract for [[TableFormat]] — the behavior ANY
  * backend must exhibit. The suite runs against BOTH shipped backends
  * (versioned parquet's rename commit; the commit log's CAS commit),
  * which is the proof the seam is pluggable: the merge semantics live
  * on the trait, a backend only supplies read + arbitrated commit. */
class TableFormatSpec extends SparkSpec {
  import spark.implicits._

  private val backends: Seq[(String, () => TableFormat)] = Seq(
    "versioned-parquet" -> (() => new VersionedParquet(
      spark, java.nio.file.Files.createTempDirectory("tfmt").toString)),
    "commit-log" -> (() => new CommitLogTable(spark)))

  private def seed(fmt: TableFormat): Unit =
    fmt.overwrite("song",
      Seq(("I1", "One", "u1"), ("I2", "Two", "u2"))
        .toDF("isrc", "name", "url"))

  for ((backend, freshFormat) <- backends) {

    test(s"[$backend] mergeInsert: only non-conflicting rows land; RETURNING is exactly the inserted set") {
      val fmt = freshFormat()
      seed(fmt)
      val batch = Seq(
        ("I2", "Two-dup", "u2b", 1), // PK conflict with existing -> skipped
        ("I3", "Three", "u3", 2),
        ("I3", "Three-later", "u3b", 3), // within-batch dup, higher position loses
        ("I4", "Four", "u1", 4)) // url conflicts with existing -> skipped
        .toDF("isrc", "name", "url", "position")
      val returned = fmt.mergeInsert("song", batch,
        Seq(Seq("isrc"), Seq("url")), Seq(col("position").asc))
      assert(rowsOf(returned.orderBy("isrc")) ==
        Seq(Seq("I3", "Three", "u3")))
      assert(rowsOf(fmt.read("song").orderBy("isrc")) == Seq(
        Seq("I1", "One", "u1"),
        Seq("I2", "Two", "u2"),
        Seq("I3", "Three", "u3")))
    }

    test(s"[$backend] idempotence: re-merging the same batch inserts nothing and mints no version") {
      val fmt = freshFormat()
      seed(fmt)
      val batch = Seq(("I3", "Three", "u3", 1)).toDF("isrc", "name", "url", "position")
      fmt.mergeInsert("song", batch, Seq(Seq("isrc")), Seq(col("position").asc))
      val vAfterFirst = fmt.currentVersion("song")
      val second = fmt.mergeInsert("song", batch, Seq(Seq("isrc")), Seq(col("position").asc))
      assert(second.isEmpty)
      assert(fmt.currentVersion("song") == vAfterFirst,
        "a no-op merge must not mint a version")
    }

    test(s"[$backend] mergeUpdateIfNull: fills only NULL targets, returns only changed rows") {
      val fmt = freshFormat()
      fmt.overwrite("song",
        Seq(("I1", Option("keep")), ("I2", Option.empty[String]),
          ("I3", Option.empty[String]))
          .toDF("isrc", "apple_url"))
      val updated = fmt.mergeUpdateIfNull("song",
        Seq(("I1", "clobber"), ("I2", "filled")).toDF("isrc", "apple_url"),
        "isrc", "apple_url")
      assert(rowsOf(updated) == Seq(Seq("I2", "filled")))
      assert(rowsOf(fmt.read("song").orderBy("isrc")) == Seq(
        Seq("I1", "keep"), Seq("I2", "filled"), Seq("I3", null)))
      // I3 untouched, nothing to update for it -> second call is a no-op
      val v = fmt.currentVersion("song")
      assert(fmt.mergeUpdateIfNull("song",
        Seq(("I1", "clobber")).toDF("isrc", "apple_url"),
        "isrc", "apple_url").isEmpty)
      assert(fmt.currentVersion("song") == v)
    }

    test(s"[$backend] versions are immutable: a reader pinned pre-merge still sees its snapshot") {
      val fmt = freshFormat()
      seed(fmt)
      val v1 = fmt.currentVersion("song")
      val pinned = fmt.readVersion("song", v1)
      fmt.mergeInsert("song",
        Seq(("I9", "Nine", "u9", 1)).toDF("isrc", "name", "url", "position"),
        Seq(Seq("isrc")), Seq(col("position").asc))
      assert(fmt.currentVersion("song") == v1 + 1)
      assert(pinned.count() == 2 && fmt.read("song").count() == 3)
    }

    test(s"[$backend] a racing committer is detected, not silently clobbered") {
      val fmt = freshFormat()
      seed(fmt)
      // this writer's merge is based on v=1; a racer commits v=2 in the
      // window before our commit lands — the commit on expectedBase=1
      // must collide instead of dropping the racer's rows
      fmt.overwrite("song",
        Seq(("I8", "Racer", "u8")).toDF("isrc", "name", "url"))
      val ex = intercept[IllegalStateException] {
        fmt.tryCommit("song",
          Seq(("I7", "Seven", "u7")).toDF("isrc", "name", "url"),
          expectedBase = 1)
      }
      assert(ex.getMessage.contains("commit race"))
      // the racer's committed state is untouched
      assert(rowsOf(fmt.read("song")) == Seq(Seq("I8", "Racer", "u8")))
    }

    test(s"[$backend] RETURNING stays valid after the commit it preceded") {
      val fmt = freshFormat()
      seed(fmt)
      val returned = fmt.mergeInsert("song",
        Seq(("I5", "Five", "u5", 1)).toDF("isrc", "name", "url", "position"),
        Seq(Seq("isrc")), Seq(col("position").asc))
      // evaluate AFTER the commit — the lazy frame reads the version the
      // anti-joins saw, which the format keeps immutable
      assert(rowsOf(returned) == Seq(Seq("I5", "Five", "u5")))
    }
  }
}
