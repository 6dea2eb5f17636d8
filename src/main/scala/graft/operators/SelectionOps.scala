package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
  * distribution matches a TARGET corpus, by importance weight
  * log w(x) = Σ_f c_f(x)·(ln θ_target[f] − ln θ_raw[f]) under
  * Laplace-smoothed bag-of-hashed-bigram models, then Gumbel top-k —
  * equivalent to sampling without replacement with probability ∝ w(x),
  * the paper's resampling step, but retry-stable and coordination-free
  * (the noise is a pure function of the doc id).
  *
  * Determinism / oracle discipline:
  *  - feature buckets: first-8-hex md5 of the bigram mod `buckets` —
  *    the engine-portable hashing-trick convention (SURVEY row 129);
  *  - the per-bucket log-ratio is rounded to 6 decimals ONCE, at the
  *    bucket table (≤ `buckets` rounding sites, not one per corpus
  *    row), and cast DECIMAL(18,6) — so the per-doc weight is an EXACT
  *    decimal sum, order-independent under any partitioning; ln's
  *    potential cross-engine 1-ulp skew is absorbed there;
  *  - Gumbel noise g = −ln(−ln u), u = (md5-high-32 + ½)/2³² ∈ (0,1)
  *    (never exactly 0/1/½ — the ½ offset sits between integers),
  *    rounded to 6 and added in decimal.
  *
  * Scale posture (100 TB): pass 1 FITS the two feature models — one
  * partial-agg groupBy over the exploded bigrams with the target
  * membership folded in as a conditional sum (bucket-domain-sized
  * result, never a second corpus scan for the target side); pass 2
  * SCORES — the log-ratio table rides back as a broadcast join (≤
  * `buckets` rows by construction) and the per-doc weight is one
  * partial-agg groupBy on the doc id. Fit-then-score is two corpus
  * scans by design (the model must exist before scoring); top-k
  * selection is TakeOrdered, never a global sort.
  */
object SelectionOps {

  /** Per-bucket smoothed log-probability ratio table:
    * round(ln((c_t+1)/(N_t+B)) − ln((c_r+1)/(N_r+B)), 6) per bucket. */
  def dsirLogRatios(
      grams: DataFrame, // (bucket, is_target) rows, one per corpus bigram
      buckets: Int
  ): DataFrame = {
    val cnt = grams
      .groupBy("bucket")
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
    val tot = cnt.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    cnt.crossJoin(broadcast(tot)).select(
      col("bucket"),
      round(
        log((col("c_t") + 1).cast("double") / (col("n_t") + buckets).cast("double")) -
          log((col("c_r") + 1).cast("double") / (col("n_r") + buckets).cast("double")),
        6).cast("decimal(18,6)").as("lr"))
  }

  private def gramBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int
  ): DataFrame =
    docs
      .select(col(idCol).as("id"), isTarget.as("is_target"),
        explode(shinglesFromTokens(tokens(col(textCol)), 2)).as("g"))
      .select(col("id"), col("is_target"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))

  /** Per-document DSIR importance weight and Gumbel-perturbed selection
    * score: (id, logw, score); select the top-k by score for a
    * without-replacement importance resample. */
  def dsirScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      seed: String = "dsir"
  ): DataFrame = {
    val grams = gramBuckets(docs, idCol, textCol, isTarget, buckets)
    val lr = dsirLogRatios(grams, buckets)
    val u = (conv(substring(md5(concat(lit(s"$seed:"), col("id").cast("string"))), 1, 8),
      16, 10).cast("bigint").cast("double") + lit(0.5)) / lit(4294967296.0)
    grams
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("lr")).as("logw")) // exact decimal fold of c_f·lr
      .withColumn("gumbel", round(-log(-log(u)), 6).cast("decimal(18,6)"))
      .select(col("id"), col("logw"),
        (col("logw") + col("gumbel")).as("score"))
  }

  /** Active-learning ANNOTATION selection — uncertainty sampling
    * (Lewis & Gale '94): fit the linear probe on the current labels
    * ([[StatsOps.linearProbeModel]] — one sufficient-statistics pass),
    * broadcast the 1-row model back, and pick the k rows whose
    * prediction sits closest to the ½ decision boundary — the rows a
    * labeling budget is best spent on. Selection is TakeOrdered on
    * |pred − ½| (never a global sort); tie-break on the id keeps the
    * pick deterministic when feature vectors repeat.
    */
  def uncertaintySample(
      df: DataFrame,
      idCol: String,
      x1: Column,
      x2: Column,
      label: Column,
      k: Int
  ): DataFrame = {
    val d0 = df.select(col(idCol).as("id"),
      x1.cast("long").as("x1"), x2.cast("long").as("x2"))
    val model = StatsOps.linearProbeModel(df, x1, x2, label).select("w0", "w1", "w2")
    d0.crossJoin(broadcast(model))
      .withColumn("pred", col("w0") + col("w1") * col("x1").cast("double") +
        col("w2") * col("x2").cast("double"))
      .withColumn("uncertainty", abs(col("pred") - lit(0.5)))
      .orderBy(col("uncertainty").asc, col("id").asc)
      .limit(k)
      .select(col("id"), col("pred"), col("uncertainty"))
  }

  /** Training-mixture epoch plan (the Llama-style data-recipe table):
    * given target mixture weights (ppm) and a total token budget, report
    * per source — available tokens, the target token allocation, and
    * epochs_ppm = how many passes over the source the allocation implies
    * (>1 000 000 ppm means the source repeats; the overfitting-risk
    * column a data recipe is judged by). Integer-exact throughout
    * (ppm × budget div 10⁶, then ×10⁶ div available). One tiny
    * aggregation (stratum-cardinality rows), no corpus shuffle.
    */
  def epochPlan(
      docs: DataFrame,
      stratumCol: String,
      tokens: Column,
      weightsPpm: Map[String, Long],
      totalBudget: Long
  ): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.values.forall(_ > 0))
    val w = weightsPpm.foldLeft(lit(null).cast("long")) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    docs
      .filter(col(stratumCol).isin(weightsPpm.keys.toSeq: _*))
      .select(col(stratumCol).as("source"), w.as("w_ppm"), tokens.cast("long").as("t"))
      .groupBy("source", "w_ppm")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("available_tokens"))
      .withColumn("target_tokens", expr(s"w_ppm * ${totalBudget}L div 1000000"))
      .withColumn("epochs_ppm", expr("target_tokens * 1000000L div available_tokens"))
      .withColumn("oversampled", col("epochs_ppm") > 1000000L)
      .orderBy("source")
  }
}
