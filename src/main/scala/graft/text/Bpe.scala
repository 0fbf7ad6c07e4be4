package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair encoding) merge training — the
  * tokenizer-training primitive of an LLM data pipeline (Sennrich et
  * al. 2016, public literature): repeatedly count adjacent symbol
  * pairs over the corpus, take the most frequent, and merge it into a
  * single symbol.
  *
  * Scale design: training operates on the DISTINCT-WORD table
  * weighted by word count — vocab-bounded, never corpus-sized — which
  * is exactly how reference BPE trainers work. Each round is ONE
  * distributed aggregation (pair → weighted count) whose argmax is a
  * single-row collect (a scalar, like the IVF centroid train), and
  * the merge application is a narrow per-row `replace` — no shuffle,
  * no growth. Rounds are inherently sequential (round r's counts
  * depend on round r−1's merge), so the driver loop IS the algorithm,
  * not a scalability compromise.
  *
  * Determinism (the oracle contract): pair counts are exact integer
  * sums; argmax tie-breaks (freq DESC, lhs ASC, rhs ASC); the merge
  * rewrites the separator-joined symbol string with `replace`, whose
  * left-to-right non-overlapping semantics are identical in Spark
  * (Java `String.replace`) and DuckDB — so "aaa" under merge (a,a)
  * becomes [aa, a] in both engines, and the generated unrolled-CTE
  * oracle ([[bpeOracleSql]]) replays training bit-for-bit.
  */
object Bpe {

  /** Symbol separator inside the packed word representation: U+001F
    * (unit separator). Safe because corpus bytes are printable ASCII
    * (32..126 — checked per snapshot); merged symbols are plain
    * concatenations, so they can never contain it. */
  val Sep = "\u001f"

  val DefaultRounds = 6

  private val mergeSchema = StructType(Seq(
    StructField("merge_idx", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("freq", LongType, nullable = false)))

  /** The weighted distinct-word table in packed symbol form:
    * (sym = chars joined by [[Sep]], cnt). */
  private def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // filter out the empty tail Java regex split keeps under
      // limit -1 ("abc".split("", -1) ends in "") so symbols are
      // exactly the characters, as DuckDB's string_split produces
      .select(array_join(
        filter(split(col("w"), ""), s => length(s) > 0), Sep).as("sym"),
        col("cnt"))

  /** Adjacent-pair weighted counts over a packed word table —
    * overlapping positions each count, the standard BPE statistic. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(col("sym"), Sep)
    words
      .select(col("cnt"), explode(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** Train `rounds` merges over the corpus. Returns the merge table
    * (merge_idx, lhs, rhs, freq) in training order — tiny (`rounds`
    * rows), the distributed computation's scalar summary, exactly
    * what a tokenizer ships. */
  def trainMerges(docs: DataFrame, rounds: Int = DefaultRounds): DataFrame = {
    val spark = docs.sparkSession
    // the only materialization: the vocab-bounded word table; each
    // round's merge is a narrow replace layered lazily on top (no
    // shuffle in that chain, so lineage depth = rounds is fine)
    val words0 = wordTable(docs).localCheckpoint(true)
    var words = words0
    val merges = Seq.newBuilder[Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // one distributed agg per round; the argmax is one row
      val top = pairCounts(words)
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // no adjacent pairs left
      else {
        val (lhs, rhs, freq) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(r, lhs, rhs, freq)
        words = words.select(
          replace(col("sym"), lit(lhs + Sep + rhs), lit(lhs + rhs)).as("sym"),
          col("cnt"))
        r += 1
      }
    }
    // the merge table is driver-side rows now; the word checkpoint's
    // blocks are dead — free them before returning
    graft.operators.CheckpointBlocks.free(words0)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1), mergeSchema)
  }

  /** Apply an already-trained merge list to the corpus: per document,
    * token count under the learned vocabulary (chars − one per merge
    * hit) plus word count — the "tokenize with the shipped tokenizer"
    * half. `merges` is the tiny driver-side merge list in training
    * order (greedy replace order matters — it is part of the
    * contract). Map-only over documents: the merge chain is `rounds`
    * narrow replaces, then one aggregation per doc. */
  def segmentCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val packed = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("doc_id"), array_join(
        filter(split(col("w"), ""), s => length(s) > 0), Sep).as("sym"))
    val merged = merges.foldLeft(packed) { case (df, (lhs, rhs)) =>
      df.withColumn("sym",
        replace(col("sym"), lit(lhs + Sep + rhs), lit(lhs + rhs)))
    }
    merged
      .select(col("doc_id"), size(split(col("sym"), Sep)).as("n_toks"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_tokens"))
  }

  /** The DuckDB oracle: BPE training unrolled as `rounds` MATERIALIZED
    * CTE steps (materialization is load-bearing — the chained
    * re-evaluation is exponential without it), each mirroring one
    * Spark round: pair counts with the identical tie-break, the merge
    * applied with the same left-to-right `replace`. */
  def bpeOracleSql(rounds: Int): String = {
    val sel = (1 to rounds)
      .map(r => s"SELECT $r AS merge_idx, lhs, rhs, CAST(freq AS BIGINT) AS freq FROM m$r")
      .mkString("\nUNION ALL ")
    s"WITH ${trainCtes(rounds)}\n$sel\nORDER BY merge_idx ASC"
  }

  /** The shared training CTE chain (w0, p1..pR, m1..mR, w1..wR). */
  private def trainCtes(rounds: Int): String = {
    val sep = "chr(31)"
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT array_to_string(string_split(w, ''), $sep) AS sym, cnt FROM (
         |    SELECT w, count(*) AS cnt FROM (
         |      SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |    WHERE len(w) > 0 GROUP BY w))""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT s[1] AS lhs, s[2] AS rhs, sum(cnt) AS freq FROM (
         |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS s
         |    FROM (SELECT cnt, string_split(sym, $sep) AS syms FROM w${r - 1})
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, freq FROM p$r
         |  ORDER BY freq DESC, lhs ASC, rhs ASC LIMIT 1),
         |w$r AS MATERIALIZED (SELECT cnt, replace(sym,
         |  (SELECT lhs FROM m$r) || $sep || (SELECT rhs FROM m$r),
         |  (SELECT lhs FROM m$r) || (SELECT rhs FROM m$r)) AS sym FROM w${r - 1})""".stripMargin
    }
    s"$w0,\n${steps.mkString(",\n")}"
  }

  /** Oracle for [[segmentCounts]] under the merges [[bpeOracleSql]]
    * trains: the same m1..mR scalar replaces applied to per-document
    * words, then per-doc word/token counts. */
  def segmentOracleSql(rounds: Int): String = {
    val sep = "chr(31)"
    val ctes = trainCtes(rounds)
    val d0 =
      s"""d0 AS MATERIALIZED (
         |  SELECT doc_id, array_to_string(string_split(w, ''), $sep) AS sym FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) > 0)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT doc_id, replace(sym,
         |  (SELECT lhs FROM m$r) || $sep || (SELECT rhs FROM m$r),
         |  (SELECT lhs FROM m$r) || (SELECT rhs FROM m$r)) AS sym FROM d${r - 1})""".stripMargin
    }
    s"""WITH $ctes,
       |$d0,
       |${steps.mkString(",\n")}
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(sym, $sep))) AS BIGINT) AS n_tokens
       |FROM d$rounds GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin
  }
}
