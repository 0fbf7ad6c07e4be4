package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.FuzzyJoin
import graft.text.TrainingMix
import graft.vector.VectorOps

/** Training-set assembly + data-quality operators added in round 3:
  * fuzzy (edit-distance) joins, deterministic shuffle/shard/pack,
  * mixture upsampling, random-projection sketching, and one-pass
  * table profiling. Every query is hash-gated against a DuckDB
  * oracle (brute-force where the Spark side is the clever one — the
  * oracle checks CORRECTNESS, the Spark plan carries the scale).
  */
object PipelineQueries {

  private[queries] val PackBudget = 512
  private[queries] val ProjPlanes = 8
  private[queries] val ProjDim = 64
  private[queries] val ProjSeed = 99L

  /** Fuzzy self-join on customer names (edit distance ≤ 1) via
    * deletion-neighborhood blocking ([[FuzzyJoin.selfJoinDist1]] —
    * exact candidates, no n² product); the oracle brute-forces the
    * same predicate. */
  def q_fuzzy_join(spark: SparkSession, dir: String): DataFrame =
    FuzzyJoin.selfJoinDist1(
      Tables.table(spark, dir, "customer"), "c_custkey", "c_name")
      .orderBy(col("a_id").asc, col("b_id").asc)

  /** Deterministic shuffle → 16 hash shards → greedy token-budget
    * packing ([[TrainingMix.packSequences]]). */
  def q_pack_sequences(spark: SparkSession, dir: String): DataFrame =
    TrainingMix.packSequences(
      Tables.table(spark, dir, "documents"), PackBudget)
      .orderBy(col("doc_id").asc)

  /** Language-tier mixture upsampling ([[TrainingMix.upsample]]):
    * en ×3, de/fr ×2, rest ×1, copy index carried. */
  def q_upsample(spark: SparkSession, dir: String): DataFrame =
    TrainingMix.upsample(Tables.table(spark, dir, "documents"))
      .orderBy(col("doc_id").asc, col("copy_idx").asc)

  /** Random-projection sketch of the embedding table onto 8 fixed
    * pseudo-random directions ([[VectorOps.project]]). */
  def q_rand_proj(spark: SparkSession, dir: String): DataFrame =
    VectorOps.project(
      Tables.table(spark, dir, "embeddings"),
      VectorOps.hyperplanes(ProjSeed, ProjPlanes, ProjDim))
      .orderBy(col("vec_id").asc)

  private val ProfileCols =
    Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")

  /** Table profiling (the ANALYZE/data-audit shape): row count,
    * non-null count, exact distinct count, and min/max per column,
    * one output row per column. Planned as a UNION of per-column
    * aggregates rather than one multi-distinct aggregate on purpose:
    * a 4-way DISTINCT forces Catalyst into a 4× Expand whose row
    * blow-up dominates the runtime (measured ~4.5 s vs <1 s on sf0.1
    * for this table), while per-column jobs each scan ONE pruned
    * parquet column — columnar layout means total bytes read are the
    * same as a single 4-column scan — and each gets proper two-phase
    * partial-distinct aggregation. */
  def q_profile(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    ProfileCols.map { c =>
      l.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
      .orderBy(col("col_name").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (q_fuzzy_join _),
    "q_pack_sequences" -> (q_pack_sequences _),
    "q_upsample" -> (q_upsample _),
    "q_rand_proj" -> (q_rand_proj _),
    "q_profile" -> (q_profile _),
  )

  // ---- DuckDB oracle SQL -------------------------------------------

  private val fuzzyJoinSql: String =
    """SELECT x.c_custkey AS a_id, y.c_custkey AS b_id,
      |       x.c_name AS a_str, y.c_name AS b_str,
      |       CAST(levenshtein(x.c_name, y.c_name) AS INTEGER) AS dist
      |FROM customer x JOIN customer y ON x.c_custkey < y.c_custkey
      |WHERE levenshtein(x.c_name, y.c_name) <= 1
      |ORDER BY a_id ASC, b_id ASC""".stripMargin

  private val packSequencesSql: String =
    s"""WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
      |    md5('ord:' || CAST(doc_id AS VARCHAR)) AS okey
      |  FROM documents),
      |b AS (SELECT doc_id, shard, n_tokens, okey,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY okey ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT doc_id, shard, n_tokens,
      |  CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin,
      |  CAST(ROW_NUMBER() OVER (
      |    PARTITION BY shard, (cum - n_tokens) // $PackBudget
      |    ORDER BY okey ASC, doc_id ASC) AS INTEGER) AS pos
      |FROM b ORDER BY doc_id ASC""".stripMargin

  private val upsampleSql: String =
    """WITH d AS (SELECT doc_id, lang,
      |    CASE WHEN lang = 'en' THEN 3
      |         WHEN lang IN ('de', 'fr') THEN 2 ELSE 1 END AS n_copies
      |  FROM documents)
      |SELECT doc_id, lang, n_copies, CAST(u.i AS INTEGER) AS copy_idx
      |FROM d, UNNEST(range(1, n_copies + 1)) AS u(i)
      |ORDER BY doc_id ASC, copy_idx ASC""".stripMargin

  private val randProjSql: String = {
    val planes = VectorOps.hyperplanes(ProjSeed, ProjPlanes, ProjDim)
    val cols = planes.zipWithIndex.map { case (p, i) =>
      val lits = p.map(d => BigDecimal(d).underlying.toPlainString)
        .mkString("[", ", ", "]")
      s"  round(${CorpusQueries.dotSql("embedding", s"($lits::DOUBLE[])")}, 10) AS p$i"
    }.mkString(",\n")
    s"""SELECT vec_id,
       |$cols
       |FROM embeddings ORDER BY vec_id ASC""".stripMargin
  }

  private val profileSql: String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_val,
         |  CAST(MAX($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name ASC")

  val oracles: Map[String, String] = Map(
    "q_fuzzy_join" -> fuzzyJoinSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_upsample" -> upsampleSql,
    "q_rand_proj" -> randProjSql,
    "q_profile" -> profileSql,
  )
}
