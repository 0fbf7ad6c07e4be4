package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.text.TextOps

/** Data-selection operators for training-corpus curation:
  * boilerplate stripping by cross-document chunk frequency (the
  * CCNet/RefinedWeb paragraph-hash filter, re-expressed over
  * fixed-width token chunks since the synthetic corpus has no line
  * structure) and DSIR-style importance resampling weights (Xie et
  * al. 2023: hashed n-gram likelihood ratios between a target and a
  * raw distribution).
  *
  * Float discipline: the only non-integer math is the per-bucket log
  * likelihood ratio, quantized to DECIMAL(20,9) at the bucket level
  * (256 rows) so every corpus-sized sum is EXACT decimal arithmetic —
  * the same log-sum determinism trick as
  * [[AdvancedQueries.q_perplexity]].
  */
object SelectionQueries {

  private val ChunkLen = 8
  private val BoilerMinDocs = 2
  private[queries] val DsirBuckets = 256
  private val DsirTopK = 50
  private[queries] val DsirTargetSource = "src0"

  /** Boilerplate removal: split every document into fixed
    * `ChunkLen`-token chunks, hash each chunk, and drop chunks whose
    * hash appears in ≥ `BoilerMinDocs` DISTINCT documents (shared
    * headers/footers/navigation in a real crawl; duplicated passages
    * here). Emits the per-document damage report (chunks, dropped,
    * surviving token count) — the form a curation pipeline joins back
    * onto the corpus.
    *
    * Plan shape at 100 TB: chunking is map-side (explode over a
    * sequence literal — no shuffle); document frequency is a
    * two-level aggregation on the chunk hash (distinct (h, doc) then
    * count — both partial-agg before their exchange); the flag join
    * is an equi-join on the hash; the damage report re-aggregates on
    * doc_id. Text itself never shuffles — only 32-byte hashes and
    * integer lengths move. */
  def q_boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val chunks = docs
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"),
        explode(expr(s"sequence(0, (size(toks) - 1) div $ChunkLen)")).as("i"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("toks"), col("i") * ChunkLen + 1, lit(ChunkLen)))).as("h"),
        least(lit(ChunkLen), col("n_toks") - col("i") * ChunkLen).as("chunk_len"))
    val boiler = chunks.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerMinDocs)
      .select(col("h"), lit(true).as("is_boiler"))
    chunks.join(boiler, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("is_boiler").isNull, col("chunk_len").cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("doc_id").asc)
  }

  /** DSIR importance weights: score every NON-target document by how
    * target-like its hashed-bigram distribution is. Bigrams hash into
    * `DsirBuckets` buckets; per-bucket Laplace-smoothed probabilities
    * under the target (`source = src0`) and raw (everything else)
    * corpora give a log-likelihood ratio per bucket, quantized to
    * DECIMAL(20,9); a document's weight is the EXACT decimal sum of
    * `count_in_doc(bucket) × ratio(bucket)`. Top-`DsirTopK` raw docs
    * = the resampling front. (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling".)
    *
    * Plan shape at 100 TB: bigram extraction is map-side (`zip_with`
    * over the token array); per-(doc, bucket) counts partial-agg on a
    * composite key; the bucket model is `DsirBuckets` rows (a
    * broadcast); scoring is one broadcast equi-join + a doc-keyed
    * aggregation; the final top-k is TakeOrderedAndProject. No
    * corpus-sized sort, no float accumulation. */
  /** The corpus pass of [[q_dsir]]: per-(doc, bucket) hashed-bigram
    * counts plus the target flag — a per-snapshot derivation (only
    * `DsirBuckets` and the target source parameterize it), staged as
    * [[LmStage.dsirDocBuckets]] because the query's plan reads it
    * TWICE (bucket model + scoring): unstaged, the bigram explode and
    * its aggregation executed twice per call. */
  private[queries] def dsirDocBucketCounts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
    docs
      .select(col("doc_id"), (col("source") === DsirTargetSource).as("is_target"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .select(col("doc_id"), col("is_target"),
        (conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long") % DsirBuckets).as("bucket"))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  def q_dsir(spark: SparkSession, dir: String): DataFrame = {
    val docBucket = LmStage.dsirDocBuckets(spark, dir)
    val bucketTotals = docBucket.groupBy("bucket")
      .agg(
        sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("t_b"),
        sum(when(!col("is_target"), col("cnt")).otherwise(0L)).as("r_b"))
    val corpus = bucketTotals.agg(
      sum(col("t_b")).as("t_total"), sum(col("r_b")).as("r_total"))
    val model = bucketTotals.crossJoin(broadcast(corpus))
      .select(col("bucket"),
        round(
          log((col("t_b") + lit(1.0)) / (col("t_total") + lit(DsirBuckets.toDouble))) -
            log((col("r_b") + lit(1.0)) / (col("r_total") + lit(DsirBuckets.toDouble))), 9)
          .cast("decimal(20,9)").as("ratio"))
    docBucket.filter(!col("is_target"))
      .join(broadcast(model), "bucket")
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        // cnt stays DECIMAL(10,0): a raw LongType operand would push the
        // product past precision 38 and Spark would silently truncate the
        // scale to 6 (allowPrecisionLoss) — the oracle keeps scale 9
        sum(col("cnt").cast("decimal(10,0)") * col("ratio")).as("w_dec"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("w_dec").cast("double"), 6).as("logw"))
      .orderBy(col("logw").desc, col("doc_id").asc)
      .limit(DsirTopK)
  }

  private[graft] val PsiBuckets = 64

  /** The PSI front half — tokenize → md5 doc-id half-split → md5
    * token bucket — as one shared map-side expression pipeline.
    * [[q_psi]] and [[graft.streaming.StreamingDrift.tokenRows]] BOTH
    * consume this, so the claimed batch/stream bit-equality can't be
    * broken by editing one copy: a parameter change here changes both
    * engines together (and the oracle SQL's `$PsiBuckets`
    * interpolation tracks the same constant). */
  private[graft] def psiTokenRows(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        (substring(md5(concat(lit("psi:"), col("doc_id").cast("string"))), 1, 1)
          <= "7").as("is_ref"),
        explode(split(col("text"), " ")).as("t"))
      .select(col("source"), col("is_ref"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
          % PsiBuckets).cast("int").as("bucket"))

  /** Population Stability Index per source — the drift monitor a
    * production corpus pipeline runs between snapshots ("has this
    * source's token distribution shifted enough to re-tune the
    * mixture?"). Reference vs current halves are a deterministic md5
    * half-split of doc_ids (the `q_sample_hash` idiom — orthogonal to
    * every other column, where doc_id PARITY would correlate with the
    * synthetic source assignment and empty one half per source); the
    * halves stand in for yesterday's/today's snapshot. Tokens hash
    * into `PsiBuckets` buckets; PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)
    * over Laplace-smoothed bucket probabilities. Each term is
    * quantized to DECIMAL(20,9) before the per-source sum (the
    * [[q_dsir]] discipline) so the corpus-sized reduction is exact
    * decimal arithmetic — identical on both engines. Standard read:
    * <0.1 stable, 0.1–0.25 drifting, >0.25 shifted.
    *
    * Plan shape at 100 TB: tokenize + bucket are map-side; per
    * (source, bucket, half) counts partial-agg on a composite key
    * bounded by \|sources\|·B·2; everything after is arithmetic over
    * that tiny table. The fact never sorts, nothing broadcasts except
    * scalars. */
  def q_psi(spark: SparkSession, dir: String): DataFrame = {
    val toks = psiTokenRows(Tables.table(spark, dir, "documents"))
    val cell = toks.groupBy("source", "bucket")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val totals = cell.groupBy("source")
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    val b = lit(PsiBuckets.toDouble)
    val p = (col("c_ref") + lit(1.0)) / (col("n_ref") + b)
    val q = (col("c_cur") + lit(1.0)) / (col("n_cur") + b)
    cell.join(totals, "source")
      .select(col("source"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 9).cast("decimal(20,9)").as("term"))
      .groupBy("source")
      .agg(min(col("n_ref")).as("n_ref_tokens"),
        min(col("n_cur")).as("n_cur_tokens"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy(col("source").asc)
  }

  /** Two-sample Kolmogorov–Smirnov drift per source over the
    * document-LENGTH distribution — the binning-free complement of
    * [[q_psi]] (a location shift PSI's 64 hash buckets can smear
    * shows up directly as an ECDF gap). Same md5 half-split as PSI.
    *
    * EXACT distributed form: KS = max_v |ECDF_ref(v) − ECDF_cur(v)|
    * is maximized at observed values, so per (source, value) counts
    * cumulate under a source-PARTITIONED window (never a global
    * single-partition sort) and the max runs over the integer
    * cross-multiplied numerator |cum_ref·n_cur − cum_cur·n_ref| —
    * ONE double division at the very end, bit-identical across
    * engines. Integer-exact while n_ref·n_cur < 2⁶³ (~3·10⁹ docs per
    * source per half); beyond that, promote the numerator to
    * decimal(38,0). Sources with an empty half are excluded (their
    * ECDF is undefined). */
  def q_ks_drift(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.table(spark, dir, "documents").select(col("source"),
      (substring(md5(concat(lit("psi:"), col("doc_id").cast("string"))), 1, 1)
        <= "7").as("is_ref"),
      col("n_chars").as("v"))
    val cell = rows.groupBy("source", "v")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("v")
    val cum = cell
      .withColumn("cum_ref", sum(col("c_ref")).over(w))
      .withColumn("cum_cur", sum(col("c_cur")).over(w))
    val totals = cell.groupBy("source")
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    cum.join(totals, "source")
      .where(col("n_ref") > 0 && col("n_cur") > 0)
      .select(col("source"), col("n_ref"), col("n_cur"),
        abs(col("cum_ref") * col("n_cur") - col("cum_cur") * col("n_ref"))
          .as("num"))
      .groupBy("source")
      .agg(min(col("n_ref")).as("n_ref_docs"),
        min(col("n_cur")).as("n_cur_docs"),
        round(max(col("num")).cast("double")
          / (min(col("n_ref")) * min(col("n_cur"))), 6).as("ks"))
      .orderBy(col("source").asc)
  }

  private[graft] val ksSql: String =
    s"""WITH r AS (SELECT source,
       |    substr(md5('psi:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '7' AS is_ref,
       |    n_chars AS v
       |  FROM documents),
       |cell AS (SELECT source, v,
       |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
       |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |  FROM r GROUP BY source, v),
       |cum AS (SELECT source, v,
       |    CAST(SUM(c_ref) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_ref,
       |    CAST(SUM(c_cur) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_cur
       |  FROM cell),
       |tot AS (SELECT source, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
       |    CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM cell GROUP BY source)
       |SELECT c.source, t.n_ref AS n_ref_docs, t.n_cur AS n_cur_docs,
       |  round(CAST(MAX(abs(c.cum_ref * t.n_cur - c.cum_cur * t.n_ref)) AS DOUBLE)
       |        / (t.n_ref * t.n_cur), 6) AS ks
       |FROM cum c JOIN tot t USING (source)
       |WHERE t.n_ref > 0 AND t.n_cur > 0
       |GROUP BY c.source, t.n_ref, t.n_cur
       |ORDER BY c.source ASC""".stripMargin

  private[graft] val SourceCapK = 10

  /** Per-source document cap: keep the `SourceCapK` highest-quality
    * documents per source — the C4/Gopher-style anti-domination gate
    * (without it, one over-represented crawl domain floods the
    * training mixture). Rank key = the blended quality score
    * ([[TextOps.qualityExpr]], identical formula to
    * `q_quality_score`), doc_id tie-break.
    *
    * Plan shape at 100 TB: scoring is map-side over the corpus scan;
    * the per-source keep-k runs on the custom heap-based
    * [[graft.plans.TopKPerGroupPlan]] in its winning regime (group
    * count = source cardinality, k tiny, no per-source sort of the
    * corpus); output is |sources|·k rows. */
  def q_source_cap(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.qualityExpr(split(col("text"), " ")).as("quality"))
    graft.plans.TopK.perGroup(scored, Seq("source"),
        Seq(("quality", false), ("doc_id", true)), SourceCapK)
      .select(col("source"), col("rank"), col("doc_id"), col("quality"))
      .orderBy(col("source").asc, col("rank").asc)
  }

  // ---- registration -------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_boilerplate" -> (q_boilerplate _),
    "q_dsir" -> (q_dsir _),
    "q_source_cap" -> (q_source_cap _),
    "q_psi" -> (q_psi _),
    "q_ks_drift" -> (q_ks_drift _))

  private val boilerplateSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id,
       |        md5(array_to_string(toks[(i*$ChunkLen+1):(i*$ChunkLen+$ChunkLen)], ' ')) AS h,
       |        LEAST($ChunkLen, len(toks) - i*$ChunkLen) AS chunk_len
       |      FROM t, UNNEST(range((len(toks)-1)//$ChunkLen + 1)) AS u(i)),
       |b AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM c GROUP BY h)
       |      WHERE df >= $BoilerMinDocs)
       |SELECT c.doc_id, COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(SUM(CASE WHEN b.h IS NULL THEN chunk_len ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM c LEFT JOIN b ON c.h = b.h
       |GROUP BY c.doc_id ORDER BY c.doc_id ASC""".stripMargin

  private val dsirSql =
    s"""WITH t AS (SELECT doc_id, source = '$DsirTargetSource' AS is_target,
       |             string_split(text, ' ') AS toks FROM documents),
       |bg AS (SELECT doc_id, is_target,
       |         ('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 8))::BIGINT % $DsirBuckets AS bucket
       |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
       |db AS (SELECT doc_id, is_target, bucket, COUNT(*) AS cnt
       |       FROM bg GROUP BY 1, 2, 3),
       |bt AS (SELECT bucket,
       |         CAST(SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS t_b,
       |         CAST(SUM(CASE WHEN NOT is_target THEN cnt ELSE 0 END) AS BIGINT) AS r_b
       |       FROM db GROUP BY bucket),
       |tot AS (SELECT CAST(SUM(t_b) AS BIGINT) AS t_total,
       |               CAST(SUM(r_b) AS BIGINT) AS r_total FROM bt),
       |model AS (SELECT bucket,
       |            CAST(round(ln((t_b + 1.0) / (t_total + $DsirBuckets.0)) -
       |                       ln((r_b + 1.0) / (r_total + $DsirBuckets.0)), 9)
       |              AS DECIMAL(20,9)) AS ratio
       |          FROM bt, tot)
       |SELECT db.doc_id, CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams,
       |       round(CAST(SUM(CAST(db.cnt AS DECIMAL(10,0)) * model.ratio) AS DOUBLE), 6) AS logw
       |FROM db JOIN model ON db.bucket = model.bucket
       |WHERE NOT db.is_target
       |GROUP BY db.doc_id
       |ORDER BY logw DESC, doc_id ASC LIMIT $DsirTopK""".stripMargin

  private val sourceCapSql = {
    val stop = TextOps.allStopwords.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
       |           FROM documents),
       |s AS (SELECT doc_id, source,
       |        round((len(list_distinct(toks)) / len(toks)) * 0.6
       |              + (1.0 - len(list_filter(toks, x -> x IN $stop))
       |                       / len(toks)) * 0.4, 6) AS quality
       |      FROM t)
       |SELECT source,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY source
       |         ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS rank,
       |       doc_id, quality
       |FROM s
       |QUALIFY rank <= $SourceCapK
       |ORDER BY source ASC, rank ASC""".stripMargin
  }

  private val psiSql =
    s"""WITH tk AS (SELECT source,
       |              substr(md5('psi:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '7' AS is_ref,
       |              ('0x' || substr(md5(t.t), 1, 8))::BIGINT % $PsiBuckets AS bucket
       |            FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
       |cell AS (SELECT source, bucket,
       |           CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
       |           CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
       |         FROM tk GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
       |          CAST(SUM(c_cur) AS BIGINT) AS n_cur
       |        FROM cell GROUP BY source),
       |term AS (SELECT cell.source, n_ref, n_cur,
       |           CAST(round(
       |             ((cell.c_ref + 1.0) / (tot.n_ref + $PsiBuckets.0)
       |              - (cell.c_cur + 1.0) / (tot.n_cur + $PsiBuckets.0))
       |             * ln(((cell.c_ref + 1.0) / (tot.n_ref + $PsiBuckets.0))
       |                  / ((cell.c_cur + 1.0) / (tot.n_cur + $PsiBuckets.0))), 9)
       |             AS DECIMAL(20,9)) AS term
       |         FROM cell JOIN tot ON cell.source = tot.source)
       |SELECT source, MIN(n_ref) AS n_ref_tokens, MIN(n_cur) AS n_cur_tokens,
       |       round(CAST(SUM(term) AS DOUBLE), 6) AS psi
       |FROM term GROUP BY source
       |ORDER BY source ASC""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_boilerplate" -> boilerplateSql,
    "q_dsir" -> dsirSql,
    "q_source_cap" -> sourceCapSql,
    "q_psi" -> psiSql,
    "q_ks_drift" -> ksSql)
}
