package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming training-mix assembly: the weighted-sampling stage of
  * [[graft.queries.PipelineQueries.q_weighted_sample]] as documents
  * ARRIVE, instead of over a finished corpus snapshot.
  *
  * Efraimidis–Spirakis A-ES is reservoir-shaped by construction —
  * "keep the k documents maximizing ln(u)/w" needs only the current
  * top-k per source as state, so the streaming form is a keyed
  * bounded reservoir (k rows per source, no watermark needed: the
  * reservoir never grows) that folds each batch in and re-emits the
  * updated ranking. The ES key is the SAME deterministic integer-mixer
  * + quantized-ln computation as the batch query, so after any batch
  * split of the same corpus the final reservoir is IDENTICAL to the
  * batch sample — asserted by StreamingSpec, which is the point: the
  * daily-arrival pipeline and the snapshot pipeline pick the same
  * training documents. */
object StreamingMix {

  final case class DocRow(doc_id: Long, source: String, n_chars: Long)
  final case class Pick(
      source: String, pick: Int, doc_id: Long, n_chars: Long,
      es_key: Double, version: Long)
  final case class Reservoir(picks: List[(Long, Long, Double)], version: Long)

  private val MixA = 2654435761L
  private val MixB = 987654321L
  private val Mod = 4294967296L // 2^32

  /** The batch query's key, bit-for-bit: u from the integer mixer
    * (every step exact in binary doubles), one ln, HALF_UP-quantized
    * at 12 decimals — Catalyst's `round` semantics replicated so
    * stream and batch rank identically. */
  private[streaming] def esKey(docId: Long, nChars: Long): Double = {
    val u = (math.floorMod(docId * MixA + MixB, Mod).toDouble + 0.5) / Mod.toDouble
    BigDecimal(java.math.BigDecimal.valueOf(math.log(u) / math.max(nChars, 1L)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Per-source streaming reservoir of the k best-keyed documents.
    * Update-mode output: each batch re-emits a key's CURRENT ranking
    * (tagged with a monotone `version` so sinks keep the latest). */
  def weightedReservoir(docs: Dataset[DocRow], k: Int = 10): Dataset[Pick] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Reservoir, Pick](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[Reservoir]) =>
          val prior = state.getOption.getOrElse(Reservoir(Nil, 0L))
          val merged = (prior.picks.iterator ++ rows.map(d =>
              (d.doc_id, d.n_chars, esKey(d.doc_id, d.n_chars))))
            .toSeq.distinct
            .sortBy { case (id, _, key) => (-key, id) }
            .take(k).toList
          val next = Reservoir(merged, prior.version + 1L)
          state.update(next)
          merged.iterator.zipWithIndex.map { case ((id, nc, key), i) =>
            Pick(source, i + 1, id, nc, key, next.version)
          }
      }
  }
}
