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
      // a ZERO-BYTE blob (corrupt upload — a certainty somewhere in a
      // 100 TB media corpus) must yield zero frames, not kill the job:
      // sequence(0, -1, 1) throws "Illegal sequence boundaries" at
      // runtime because the positive step contradicts the descending
      // range. explode of the empty array drops the row.
      .withColumn("frame_idx",
        explode(when(col("n_chunks") > 0,
            sequence(lit(0), col("n_chunks") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
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

  /** pHash-style perceptual fingerprint per asset: a fixed-width bit
    * signature where bit p says "grid cell p is brighter than the
    * asset overall" — the classic perceptual-hash recipe (resize to a
    * fixed grid, threshold each cell against the whole image) over
    * this module's chunk features instead of DCT coefficients (no
    * codecs in this container; a real pipeline swaps
    * [[frameFeatures]]' internals for decoded pixels and this
    * operator is unchanged).
    *
    * Composition: [[frameSample]] (stride 1 — every chunk) →
    * [[frameFeatures]] (per-chunk byte means) → fixed `bits`-cell
    * grid via `pos = frame_idx·bits div n_chunks` (the "resize": any
    * media length lands on the same grid width) → one bit per cell.
    * The threshold compare is EXACT INTEGER arithmetic: per-chunk
    * byte sums are recovered from the feature means
    * (`round(mean·len)` — the mean is one integer sum divided once,
    * so the product round-trips exactly), and
    * "cell mean > asset mean" is cross-multiplied
    * (`s_p·C > S·c_p`), never a float division — which is what lets
    * DuckDB replay the hash bit-for-bit as the oracle.
    *
    * Scale: media bytes never shuffle (features are map-side); what
    * aggregates is (asset_id, pos, two longs). Output:
    * (asset_id, phash: long). */
  def perceptualHash(assets: DataFrame, chunkSize: Int = 16, bits: Int = 32): DataFrame = {
    val feats = frameFeatures(frameSample(assets, chunkSize, 1)).toDF()
    val lens = assets.select(col("asset_id"), length(col("media")).cast("long").as("blen"))
    val chunked = feats.join(lens, "asset_id")
      .withColumn("chunk_len",
        least(lit(chunkSize), col("blen") - col("frame_idx") * chunkSize).cast("long"))
      .withColumn("chunk_sum", round(col("mean_byte") * col("chunk_len")).cast("long"))
      .withColumn("pos",
        expr(s"cast(frame_idx * $bits div ((blen + ${chunkSize - 1}) div $chunkSize) as int)"))
    val grid = chunked.groupBy("asset_id", "pos")
      .agg(sum(col("chunk_sum")).as("s_p"), sum(col("chunk_len")).as("c_p"))
    val totals = chunked.groupBy("asset_id")
      .agg(sum(col("chunk_sum")).as("s"), sum(col("chunk_len")).as("c"))
    grid.join(totals, "asset_id")
      .withColumn("bit", (col("s_p") * col("c") > col("s") * col("c_p")).cast("long"))
      .groupBy("asset_id")
      .agg(sum(expr(s"shiftleft(bit, ${bits - 1} - pos)")).as("phash"))
  }

  /** Perceptual-hash near-duplicate pairs (image dedup): Hamming
    * distance ≤ `maxHam` over [[perceptualHash]] signatures, found via
    * banded LSH exactly like [[graft.text.TextOps.simhashNearPairs]] —
    * split the signature into `bands` equal bit-bands; pigeonhole
    * guarantees any pair within Hamming `bands − 1` shares a band, so
    * candidate generation is EXACT for `maxHam < bands` and the
    * per-pair `bit_count(xor)` verify touches candidates only, never
    * n². Ties the multimodal column into the dedup family: the same
    * banded join that serves MinHash/SimHash text dedup serves image
    * dedup once a fingerprint exists. */
  def phashNearPairs(assets: DataFrame, chunkSize: Int = 16, bits: Int = 32,
      bands: Int = 2, maxHam: Int = 1): DataFrame = {
    require(maxHam < bands, s"pigeonhole recall needs maxHam < bands ($maxHam >= $bands)")
    phashNearPairsFromBands(phashBandRows(assets, chunkSize, bits, bands), maxHam)
  }

  /** Band rows over [[perceptualHash]] signatures — (asset_id, phash,
    * band, bkey), one row per band of each signature. This is the
    * PERSISTABLE index shape the incremental path probes: production
    * materializes it once per asset-corpus snapshot
    * ([[graft.queries.DedupStage.phashPriorIndex]]) and a daily batch
    * joins its own band rows against it — image bytes, features, and
    * hashes of the prior corpus are never recomputed. */
  def phashBandRows(assets: DataFrame, chunkSize: Int = 16, bits: Int = 32,
      bands: Int = 2): DataFrame = {
    require(bits % bands == 0, s"bits must split evenly into bands ($bits % $bands)")
    val bandBits = bits / bands
    perceptualHash(assets, chunkSize, bits)
      .select(col("asset_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(phash, ($bands - 1 - band) * $bandBits) % ${1L << bandBits}"))
  }

  /** Shared candidate→pair tail: dedup on the id pair BEFORE the
    * popcount verify (the measured FuzzyJoin/minhash ordering — the
    * exchange rebalances hot-band join output and the verify runs
    * once per distinct pair, not once per shared band). */
  private def verifiedPairs(cand: DataFrame, maxHam: Int): DataFrame =
    cand
      .dropDuplicates("a", "b")
      .withColumn("hamming", expr("cast(bit_count(pa ^ pb) as int)"))
      .where(col("hamming") <= maxHam)
      .select("a", "b", "hamming")

  /** Intra-set near-dup pairs over already-built band rows. */
  def phashNearPairsFromBands(banded: DataFrame, maxHam: Int = 1): DataFrame =
    verifiedPairs(
      banded.as("x")
        .join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
          col("x.phash").as("pa"), col("y.phash").as("pb")),
      maxHam)

  /** Cross near-dup pairs between a persisted band index (the prior
    * corpus) and a new batch's band rows — the daily incremental
    * image-dedup probe. Candidates meet only on an equal (band, bkey),
    * so the prior corpus never re-hashes and the join is bounded by
    * true band collisions, never |prior|·|batch|. Output pairs are
    * (least, greatest) id-ordered; `hamming` is symmetric, so side
    * order doesn't matter to the verify. */
  def phashNearPairsAgainstIndex(index: DataFrame, batchBands: DataFrame,
      maxHam: Int = 1): DataFrame =
    verifiedPairs(
      index.as("x")
        .join(batchBands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.asset_id") =!= col("y.asset_id"))
        .select(
          least(col("x.asset_id"), col("y.asset_id")).as("a"),
          greatest(col("x.asset_id"), col("y.asset_id")).as("b"),
          col("x.phash").as("pa"), col("y.phash").as("pb")),
      maxHam)
}
