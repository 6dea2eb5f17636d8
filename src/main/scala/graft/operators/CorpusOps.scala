package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics and per-key capping — the curation operators
  * that need GLOBAL state (document frequency, corpus size, per-domain
  * counts) rather than per-row functions.
  *
  * Scale posture (100 TB):
  *  - vocabulary/df: explode → two-level aggregation; the first groupBy
  *    (token, doc) has map-side partial aggregation, the second is
  *    vocab-sized (≪ corpus). No countDistinct Expand — distinct-per-doc
  *    is the first grouping level.
  *  - tf-idf join: the df table is vocab-sized → broadcast; the corpus
  *    side never shuffles for the join (only for its own token agg).
  *  - capPerKey: one row_number window; InferWindowGroupLimit prunes to
  *    a map-side top-k heap before the shuffle, so a hot key (one domain
  *    = half the crawl) never funnels all its rows through one reducer.
  */
object CorpusOps {

  /** Keep at most `k` rows per key, by a total order. A single
    * `row_number ≤ k` window: Spark ≥3.5's InferWindowGroupLimit rewrites
    * this into Partial WindowGroupLimit BEFORE the shuffle (map-side
    * bounded top-k heap per key), so each reducer receives at most
    * inputPartitions·k rows per key regardless of key skew — the same
    * bound a manual salt+two-window phase gives, without its second
    * shuffle (measured 2× faster and scale-flat at 100M rows, see
    * SURVEY §8 scale probe; the plan shape is pinned by PlanAuditSpec).
    * `orderCols` must be a total order within a key (tie-break on a
    * unique id) or the kept set is nondeterministic.
    */
  def capPerKey(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[Column],
      k: Int
  ): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)))
      .filter(col("rn") <= k)

  /** Per-(doc, token) counts with stopwords and empty tokens removed —
    * the shared first stage of vocabulary and tf-idf. Map-side combine
    * applies (count over an exploded projection). */
  def docTermCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "" && !col("token").isin(TextFunctions.allStopwords: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: top `topV` tokens by total term frequency with
    * document frequency, deterministic tie-break on the token. The
    * second aggregation re-uses the (doc, token) grouping as the
    * distinct-doc count, so no count-distinct Expand is planned. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, topV: Int): DataFrame =
    docTermCounts(docs, idCol, textCol)
      .groupBy("token")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topV)

  /** Curation filter funnel: ordered rules, each document attributed to
    * its FIRST failing rule (or "kept"), per-verdict counts. The
    * attribution is one coalesce-of-whens projection — a single scan,
    * one tiny aggregation, and the funnel report every curation run
    * needs (which rule is dropping the data?). */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val verdict = coalesce(rules.map { case (n, c) => when(c, lit(n)) } :+ lit("kept"): _*)
    df.withColumn("verdict", verdict)
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Cross-document duplicated-span statistics (the n-gram-granularity
    * approximation of substring training-data dedup): for each document,
    * how many of its distinct word n-grams also occur in ≥ `minDf`
    * documents, and the duplicated fraction.
    *
    * Shape: ONE scan computes hashed shingle sets (native kernel, hashed
    * once); the per-shingle document frequency is a count window over the
    * hash — one shuffle, no df-table join, and crucially no second scan
    * of the tokenize→shingle pipeline (a join against a separately
    * aggregated df table re-executes the scan on both sides). The per-doc
    * rollup is the second and last shuffle.
    */
  def duplicatedSpanStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDf: Int = 2
  ): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      explode(DedupOps.hashedShingleSet(col(textCol), n)).as("h"))
    val withDf = sh.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
    withDf
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_fraction", col("n_dup").cast("double") / col("n_ngrams"))
  }

  /** Per-document top term by a log-free tf-idf score: tf·N/df computed
    * as CAST(tf·N AS DOUBLE)/df — one IEEE division on integer-exact
    * inputs, so the value is bit-identical in any engine (a log-based
    * idf would differ across libm implementations). Monotone in tf and
    * 1/df, which is all a ranking needs. N rides in as a 1-row broadcast
    * (no driver-side action). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docTermCounts(docs, idCol, textCol)
    val dfTable = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = terms
      .join(broadcast(dfTable), "token")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("token").as("term"), col("tf"), col("df"), col("score"))
  }
}
