package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming PSI drift monitor: the per-source Population Stability
  * Index of [[graft.queries.SelectionQueries.q_psi]] maintained as
  * documents ARRIVE, instead of over a finished corpus snapshot — the
  * live form of "has this source's token distribution shifted enough
  * to re-tune the mixture?".
  *
  * PSI is sufficient-statistics-shaped: the index is pure arithmetic
  * over per-(source, bucket, half) token counts, so the streaming
  * state is a bounded counter map (≤ `Buckets` × 2 longs per source —
  * no watermark needed, the state never grows past the bucket
  * space) and each micro-batch folds its counts in and re-emits the
  * source's CURRENT index. Tokenize/bucket/half-split run as ordinary
  * Catalyst expressions BEFORE the stateful operator (map-side, the
  * same `md5` expressions as the batch query), and the in-state PSI
  * replicates the batch decimal discipline (9-dp HALF_UP term
  * quantization, exact sum, 6-dp output — Catalyst `round` semantics
  * via `BigDecimal.valueOf`, the [[StreamingMix.esKey]] precedent),
  * so after ANY batch split of the same corpus the final emission per
  * source is IDENTICAL to the batch query — asserted by
  * StreamingSpec. */
object StreamingDrift {

  final case class TokenRow(source: String, is_ref: Boolean, bucket: Int)
  final case class DriftState(
      ref: Map[Int, Long], cur: Map[Int, Long], version: Long)
  final case class PsiRow(
      source: String, n_ref_tokens: Long, n_cur_tokens: Long,
      psi: Double, version: Long)

  // the single source of truth for the bucket space AND the
  // tokenize/half-split/bucket expressions lives with the batch
  // query — a parameter change there changes both cadences together
  private def Buckets = graft.queries.SelectionQueries.PsiBuckets

  /** The batch query's tokenize → half-split → bucket pipeline —
    * literally [[graft.queries.SelectionQueries.psiTokenRows]], the
    * same Catalyst expressions — over a (streaming or batch)
    * documents frame: bit-identical input rows for both cadences. */
  def tokenRows(docs: DataFrame): Dataset[TokenRow] = {
    import docs.sparkSession.implicits._
    graft.queries.SelectionQueries.psiTokenRows(docs).as[TokenRow]
  }

  private def quantize(x: Double, scale: Int): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP)

  /** PSI over the accumulated counter maps — the identical arithmetic
    * chain as the batch query's decimal-quantized aggregation. */
  private[streaming] def psiOf(
      ref: Map[Int, Long], cur: Map[Int, Long]): (Long, Long, Double) = {
    val nRef = ref.values.sum
    val nCur = cur.values.sum
    val sum = (ref.keySet ++ cur.keySet).toSeq.sorted.map { b =>
      val p = (ref.getOrElse(b, 0L) + 1.0) / (nRef + Buckets.toDouble)
      val q = (cur.getOrElse(b, 0L) + 1.0) / (nCur + Buckets.toDouble)
      quantize((p - q) * math.log(p / q), 9)
    }.sum
    (nRef, nCur, quantize(sum.toDouble, 6).toDouble)
  }

  /** Per-source streaming PSI. Update-mode output: each batch
    * re-emits a source's current index tagged with a monotone
    * `version` so sinks keep the latest. */
  def psiMonitor(toks: Dataset[TokenRow]): Dataset[PsiRow] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.source)
      .flatMapGroupsWithState[DriftState, PsiRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[DriftState]) =>
          val prior = state.getOption.getOrElse(
            DriftState(Map.empty, Map.empty, 0L))
          var ref = prior.ref
          var cur = prior.cur
          rows.foreach { r =>
            if (r.is_ref) ref = ref.updated(r.bucket, ref.getOrElse(r.bucket, 0L) + 1L)
            else cur = cur.updated(r.bucket, cur.getOrElse(r.bucket, 0L) + 1L)
          }
          val next = DriftState(ref, cur, prior.version + 1L)
          state.update(next)
          val (nr, nc, psi) = psiOf(ref, cur)
          Iterator.single(PsiRow(source, nr, nc, psi, next.version))
      }
  }
}
