package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene step (a training doc containing a benchmark item's 13-gram
  * leaks the answer into the model).
  *
  * Scale posture: the benchmark side is small by nature (eval suites are
  * thousands of items, the corpus is the 100 TB side) — its distinct
  * shingle hashes BROADCAST, so the corpus scan stays partition-local:
  * one linear pass computing hashed shingles (native kernel, hashed once
  * per shingle), a broadcast hash join, and ONE shuffle for the per-doc
  * hit aggregation. No corpus self-join, no sort.
  */
object DecontamOps {

  /** Per-document benchmark-overlap hits: (doc_id, n_hits) for every doc
    * of `docs` sharing at least one word n-gram with `bench`. n_hits =
    * number of DISTINCT shared n-grams (hashedShingleSet de-dups per doc
    * and the bench side is distinct, so a plain count is exact).
    */
  def contaminationHits(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      broadcastBench: Boolean = true
  ): DataFrame = {
    val dSh = docs.select(col(idCol).as("doc_id"),
      explode(DedupOps.hashedShingleSet(col(textCol), n)).as("h"))
    val bSh0 = bench.select(explode(DedupOps.hashedShingleSet(col(benchTextCol), n)).as("h")).distinct()
    val bSh = if (broadcastBench) broadcast(bSh0) else bSh0
    dSh.join(bSh, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-BENCHMARK-ITEM contamination report — the audit artifact an
    * eval owner needs: for each benchmark item, how many training docs
    * share at least one word n-gram with it, and how many distinct
    * grams leak. Same scale shape as [[contaminationHits]] (bench side
    * broadcasts, corpus scans once); the aggregation flips to the bench
    * id, which is small by nature, so the final groupBy is tiny.
    */
  def contaminationReport(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      benchIdCol: String,
      n: Int,
      broadcastBench: Boolean = true
  ): DataFrame = {
    val dSh = docs.select(col(idCol).as("doc_id"),
      explode(DedupOps.hashedShingleSet(col(textCol), n)).as("h"))
    val bSh0 = bench.select(col(benchIdCol).as("bench_id"),
      explode(DedupOps.hashedShingleSet(col(benchTextCol), n)).as("h"))
    val bSh = if (broadcastBench) broadcast(bSh0) else bSh0
    dSh.join(bSh, "h")
      .groupBy("bench_id")
      .agg(countDistinct(col("doc_id")).as("n_contaminating_docs"),
        countDistinct(col("h")).as("n_shared_grams"))
  }

  /** Training rows with benchmark overlap removed (anti join on hits). */
  def decontaminated(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int
  ): DataFrame = {
    val hits = contaminationHits(docs, textCol, idCol, bench, benchTextCol, n)
    docs.join(hits, docs(idCol) === hits("doc_id"), "left_anti")
  }
}
