package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Asset

/** Multimodal plumbing over synthesized binary fixtures (decode is a
  * documented stub — no codecs in this environment; the schema,
  * partition-batched UDF shape, chunk explode, and metadata joins are
  * the real thing). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(header: String, payloadLen: Int): Array[Byte] =
    (header.getBytes("UTF-8") ++ Array.fill(payloadLen)(0x42.toByte))

  private val assets = Seq(
    Asset(1L, "image", bytes("IMG:640x480:", 100)),
    Asset(2L, "image", bytes("IMG:100x2000:", 50)),
    Asset(3L, "audio", bytes("AUD:44100:2500:", 400)),
    Asset(4L, "blob", bytes("RAW:", 10)),
  ).toDS()

  test("stub decode extracts typed metadata per kind") {
    val m = Multimodal.decodeMeta(assets).collect().map(d => d.asset_id -> d).toMap
    assert(m(1L).width === 640 && m(1L).height === 480)
    assert(m(2L).height === 2000)
    assert(m(3L).sample_rate === 44100 && m(3L).duration_ms === 2500)
    assert(m(4L).width === 0 && m(4L).byte_len === 14)
  }

  test("resize metadata preserves aspect ratio under max edge") {
    val r = Multimodal.resizeMeta(Multimodal.decodeMeta(assets), maxEdge = 200)
      .select("asset_id", "out_width", "out_height")
      .as[(Long, Int, Int)].collect().map { case (k, v, w) => k -> (v, w) }.toMap
    assert(r(1L) === (200, 150))   // 640x480 → 200x150
    assert(r(2L) === (10, 200))    // 100x2000 → 10x200
    assert(r(3L) === (0, 0))       // audio has no dims
  }

  test("frame sampling chunks the payload with stride") {
    val frames = Multimodal.frameSample(assets.toDF(), chunkSize = 32, stride = 2)
      .where($"asset_id" === 3L)
    val idxs = frames.select("frame_idx").as[Int].collect().toSeq.sorted
    // 415 bytes → 13 chunks → stride 2 keeps 0,2,4,6,8,10,12
    assert(idxs === Seq(0, 2, 4, 6, 8, 10, 12))
    val lens = frames.select(length($"frame")).as[Int].collect()
    assert(lens.count(_ === 32) === 6) // all but the tail chunk full
  }

  test("frame sampling: a zero-byte blob yields zero frames, not a crash") {
    // a corrupt empty upload is a certainty somewhere in a large media
    // corpus; without the guard, sequence(0, -1, stride) throws
    // "Illegal sequence boundaries" and kills the whole job
    val withEmpty = assets.toDF()
      .unionByName(Seq(Asset(99L, "image", Array.empty[Byte])).toDS().toDF())
    val frames = Multimodal.frameSample(withEmpty, chunkSize = 32, stride = 1)
    assert(frames.where($"asset_id" === 99L).isEmpty)
    assert(frames.where($"asset_id" === 3L).count() === 13) // others intact
  }

  test("frame features: constant payload has zero entropy, header raises it") {
    val f = Multimodal.frameFeatures(
      Multimodal.frameSample(assets.toDF(), 32, 1))
      .collect().groupBy(_.asset_id)
    // asset 1 payload chunks are all 0x42 → entropy 0, mean 0x42
    val tail = f(1L).filter(_.frame_idx > 0)
    assert(tail.forall(c => c.entropy === 0.0 && c.mean_byte === 0x42.toDouble))
    assert(f(1L).find(_.frame_idx == 0).get.entropy > 0.0)
  }

  // a deterministic pseudo-image: bright/dark stripes over the byte
  // range, so grid cells genuinely differ from the asset mean
  private def striped(seed: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => (((i / 7 + seed) * 37) % 251).toByte)

  test("perceptual hash: identical media hash equal, a flipped region flips bits, grid width is fixed") {
    val media = Seq(
      (1L, striped(0, 400)),
      (2L, striped(0, 400)), // exact duplicate of 1
      (3L, striped(9, 400)), // different striping
      (4L, striped(0, 123))) // different length — still a 32-cell grid
      .toDF("asset_id", "media")
    val ph = Multimodal.perceptualHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) === ph(2L))
    assert(ph(1L) !== ph(3L))
    // 32-bit signature regardless of media length
    assert(ph.values.forall(v => v >= 0L && v < (1L << 32)))
  }

  test("phash near-pairs: banded join finds the duplicate pair, Hamming verify bounds distance") {
    val media = (Seq(
      (1L, striped(0, 400)),
      (2L, striped(0, 400)),
      (3L, striped(9, 400)),
      (4L, striped(23, 380)),
      (5L, striped(40, 390))))
      .toDF("asset_id", "media")
    val pairs = Multimodal.phashNearPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    assert(pairs.forall { case (a, b, h) => a < b && h <= 1 })
    // pigeonhole exactness: the banded candidates + verify equal the
    // brute-force predicate over the hashes
    val ph = Multimodal.perceptualHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = for {
      a <- ph.keys.toSeq; b <- ph.keys.toSeq if a < b
      if java.lang.Long.bitCount(ph(a) ^ ph(b)) <= 1
    } yield (a, b, java.lang.Long.bitCount(ph(a) ^ ph(b)))
    assert(pairs.toSet === brute.toSet)
  }

  test("incremental phash: index probe + intra-batch equals the full join restricted to batch-touching pairs") {
    // i % 4 selects the stripe pattern, so assets 4 apart are exact
    // duplicates — e.g. {1,5,9} with 9 in the batch (9 % 3 == 0):
    // cross pairs (1,9)/(5,9) and prior-only pair (1,5) both exist
    val all = (1L to 12L).map(i => (i, striped((i % 4).toInt, 320)))
    val media = all.toDF("asset_id", "media")
    val prior = media.where($"asset_id" % 3 =!= 0)
    val batch = media.where($"asset_id" % 3 === 0)
    val idx = Multimodal.phashBandRows(prior)
    val bb = Multimodal.phashBandRows(batch)
    val got = Multimodal.phashNearPairsAgainstIndex(idx, bb)
      .unionByName(Multimodal.phashNearPairsFromBands(bb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Multimodal.phashNearPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => a % 3 == 0 || b % 3 == 0 }.toSet
    assert(got === full)
    assert(got.nonEmpty) // the fixture plants at least one cross dup
  }
}
