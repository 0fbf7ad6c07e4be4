package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample plumbing a training-data pipeline needs.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (it parses the synthetic
  * `IMG:<w>x<h>:` / `AUD:<hz>:<ms>:` headers our test fixtures
  * carry). Everything around it — binary schema, typed Datasets,
  * per-partition batched processing, chunked frame explode — is real
  * Spark plumbing that a real codec would drop into unchanged.
  *
  * Scale: media bytes never shuffle — decode/feature ops are map-only
  * over the partition iterator (the JVM analog of `mapInPandas`
  * batches); frame sampling explodes bounded chunk counts; metadata
  * (small) is what joins onward.
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, media: Array[Byte])

  final case class DecodedMeta(
      asset_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Int)

  /** STUB decode (no codecs in this environment): parses the fixture
    * header instead of real image/audio bytes. A production build
    * replaces ONLY the `parse` internals (e.g. JNI to libjpeg /
    * ffmpeg); the partition-iterator shape stays. */
  def decodeMeta(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // batched per-partition processing: one header parse per asset,
      // no per-row task overhead — where a real decoder would also
      // amortize its codec context across the partition
      it.map { a =>
        val header = new String(a.media.take(16), "UTF-8")
        val parts = header.split(":")
        parts.headOption match {
          case Some("IMG") =>
            val dims = parts(1).split("x")
            DecodedMeta(a.asset_id, a.kind, a.media.length.toLong,
              dims(0).toInt, dims(1).toInt, 0, 0)
          case Some("AUD") =>
            DecodedMeta(a.asset_id, a.kind, a.media.length.toLong,
              0, 0, parts(1).toInt, parts(2).toInt)
          case _ =>
            DecodedMeta(a.asset_id, a.kind, a.media.length.toLong, 0, 0, 0, 0)
        }
      }
    }
  }

  /** Pure-metadata resize: target dims preserving aspect ratio with a
    * max edge (the pixel work itself would live in the stubbed
    * decoder). */
  def resizeMeta(meta: Dataset[DecodedMeta], maxEdge: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxEdge) / greatest(col("width"), col("height"), lit(1)))
    meta.toDF()
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame/chunk sampling: split the binary payload into fixed-size
    * chunks and keep every `stride`-th one — the shape of video
    * frame-sampling (chunk ≈ frame) without a real demuxer.
    * Pure SQL expressions: binary `substring` is codegen'd. */
  def frameSample(assets: DataFrame, chunkSize: Int, stride: Int): DataFrame =
    assets
      .withColumn("n_chunks",
        ((length(col("media")) + chunkSize - 1) / chunkSize).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_chunks") - 1, lit(stride))))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $chunkSize + 1, $chunkSize)"))
      .select("asset_id", "frame_idx", "frame")

  final case class ChunkFeature(asset_id: Long, frame_idx: Int, mean_byte: Double, entropy: Double)

  /** Feature extraction per sampled frame: byte-mean + empirical byte
    * entropy — a deterministic stand-in for an embedding model, with
    * the same per-partition batched shape. */
  def frameFeatures(frames: DataFrame): Dataset[ChunkFeature] = {
    import frames.sparkSession.implicits._
    frames.select("asset_id", "frame_idx", "frame")
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, idx, bytes) =>
          val n = math.max(bytes.length, 1)
          val mean = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
          val counts = new Array[Int](256)
          bytes.foreach(b => counts(b & 0xff) += 1)
          val entropy = counts.foldLeft(0.0) { (acc, c) =>
            if (c == 0) acc
            else { val p = c.toDouble / n; acc - p * math.log(p) / math.log(2) }
          }
          ChunkFeature(id, idx, mean, entropy)
        }
      }
  }
}
