package graft

import org.apache.spark.sql.functions._

import graft.etl.{CommitLogTable, ManifestParquet, TableFormat, VersionedParquet}

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
    "commit-log" -> (() => new CommitLogTable(spark)),
    "manifest-parquet" -> (() => new ManifestParquet(
      spark, java.nio.file.Files.createTempDirectory("tfmt_m").toString)))

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

    test(s"[$backend] tryAppend: next version = pinned content + delta; pinned readers unmoved") {
      val fmt = freshFormat()
      seed(fmt) // v1: I1, I2
      val v1 = fmt.currentVersion("song")
      val v2 = fmt.tryAppend("song",
        Seq(("I3", "Three", "u3")).toDF("isrc", "name", "url"), v1, v1)
      assert(v2 == v1 + 1)
      assert(rowsOf(fmt.read("song").orderBy("isrc")) == Seq(
        Seq("I1", "One", "u1"), Seq("I2", "Two", "u2"), Seq("I3", "Three", "u3")))
      assert(fmt.readVersion("song", v1).count() == 2)
    }

    test(s"[$backend] tryAppend supersedes an orphan version without absorbing its rows") {
      val fmt = freshFormat()
      seed(fmt) // v1 = pinned consistent state
      val pinned = fmt.currentVersion("song")
      // a crashed run left an orphan v2 no manifest references
      fmt.tryCommit("song",
        Seq(("IX", "Orphan", "ux")).toDF("isrc", "name", "url"), pinned)
      val orphanTop = fmt.currentVersion("song")
      // the next healthy run reads PINNED, commits on top of CURRENT:
      // content = pinned ∪ delta — the orphan's rows must not leak in
      val v3 = fmt.tryAppend("song",
        Seq(("I3", "Three", "u3")).toDF("isrc", "name", "url"),
        pinned, orphanTop)
      assert(v3 == orphanTop + 1)
      assert(rowsOf(fmt.readVersion("song", v3).orderBy("isrc")) == Seq(
        Seq("I1", "One", "u1"), Seq("I2", "Two", "u2"), Seq("I3", "Three", "u3")))
    }

    test(s"[$backend] a racing tryAppend collides instead of silently losing a day") {
      val fmt = freshFormat()
      seed(fmt)
      val base = fmt.currentVersion("song")
      fmt.tryAppend("song",
        Seq(("I3", "Winner", "u3")).toDF("isrc", "name", "url"), base, base)
      val ex = intercept[IllegalStateException] {
        fmt.tryAppend("song",
          Seq(("I4", "Loser", "u4")).toDF("isrc", "name", "url"), base, base)
      }
      assert(ex.getMessage.contains("commit race"))
      assert(fmt.read("song").where(col("name") === "Winner").count() == 1)
    }
  }

  // ---- manifest-parquet-specific: the O(batch) commit guarantee ----

  private def dataBytes(root: String): Long =
    graft.etl.Compaction.dataBytes(spark, root)

  test("[manifest-parquet] an append commit writes O(batch) bytes, not O(history)") {
    val root = java.nio.file.Files.createTempDirectory("tfmt_obatch").toString
    val fmt = new ManifestParquet(spark, root)
    // history: 200k rows with a fat payload column
    val history = spark.range(200000)
      .select(col("id"), concat(lit("payload-"), md5(col("id").cast("string"))).as("v"))
    fmt.overwrite("t", history)
    val historyBytes = dataBytes(root)
    val before = historyBytes
    // the daily batch: 50 rows
    val batch = spark.range(1000000, 1000050)
      .select(col("id"), concat(lit("payload-"), md5(col("id").cast("string"))).as("v"))
    val v = fmt.tryAppend("t", batch, fmt.currentVersion("t"), fmt.currentVersion("t"))
    val appended = dataBytes(root) - before
    assert(appended > 0, "the append must write the batch's files")
    assert(appended < historyBytes / 10,
      s"append wrote $appended bytes against $historyBytes of history — " +
        "an O(batch) commit must not rewrite history")
    assert(fmt.readVersion("t", v).count() == 200050)
  }

  test("[manifest-parquet] compact folds N data dirs into one; pinned readers keep theirs") {
    val root = java.nio.file.Files.createTempDirectory("tfmt_compact").toString
    val fmt = new ManifestParquet(spark, root)
    fmt.overwrite("t", spark.range(10).toDF("id"))
    for (day <- 1 to 5) {
      val cur = fmt.currentVersion("t")
      fmt.tryAppend("t", spark.range(day * 100, day * 100 + 10).toDF("id"), cur, cur)
    }
    val preCompact = fmt.currentVersion("t")
    val rows = rowsOf(fmt.read("t").orderBy("id"))
    val v = fmt.compact("t")
    assert(rowsOf(fmt.readVersion("t", v).orderBy("id")) == rows)
    // compacted version reads from a single data dir: appending once
    // more only references 2 dirs' worth of files
    assert(rowsOf(fmt.readVersion("t", preCompact).orderBy("id")) == rows,
      "pinned pre-compact version must still resolve")
  }

  test("[manifest-parquet] an empty version reads back with its schema, no inference") {
    val root = java.nio.file.Files.createTempDirectory("tfmt_empty").toString
    val fmt = new ManifestParquet(spark, root)
    fmt.overwrite("t", spark.range(3).toDF("id").limit(0))
    assert(fmt.read("t").schema.fieldNames.toSeq == Seq("id"))
    assert(fmt.read("t").isEmpty)
  }
}
