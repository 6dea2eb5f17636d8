package graft

import graft.operators.{CorpusOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Round-10 operator specs. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("semanticDedup oversized-cell guard: sub-banded pairs ≡ the unguarded join") {
    // the k-means-collapse shape the guard exists for: nCells = 1 puts
    // EVERY vector on one join key. 30 random vectors + a shift-perturbed
    // near-copy of each (cosine ≈0.9988) — some but not all rows prune.
    val r = new scala.util.Random(11)
    val dim = 8
    val base = (0 until 30).map(i => (i.toLong, Seq.tabulate(dim)(_ => r.nextGaussian())))
    val copies = base.map { case (id, v) =>
      (id + 1000, v.zipWithIndex.map { case (x, j) => x + 0.05 * v((j + 1) % dim) })
    }
    val df = (base ++ copies).toDF("id", "vec").repartition(3)
    def survivors() = SimilarityOps.semanticDedup(df, "id", "vec", nCells = 1, tau = 0.99)
      .collect().map(_.getLong(0)).sorted.toSeq
    // default cap (4096): 60 rows stay under it → the plain-self-join path
    val unguarded = survivors()
    assert(unguarded.nonEmpty && unguarded.size < 60, "some but not all rows must prune")
    // force the 60-row cell over an 8-row cap → the sub-banded overflow
    // path (xxhash64-chunk grid join) must yield the IDENTICAL survivors
    spark.conf.set("spark.graft.semdedup.cellCap", "8")
    spark.conf.set("spark.graft.semdedup.cellSplits", "4")
    try assert(survivors() == unguarded)
    finally {
      spark.conf.unset("spark.graft.semdedup.cellCap")
      spark.conf.unset("spark.graft.semdedup.cellSplits")
    }
  }

  test("driver-side BPE trainer ≡ the unrolled distributed rounds, merge for merge") {
    // overlap-heavy corpus: repeated runs force the greedy left-to-right
    // application corner ("aaaa" + (a,a) → [aa][aa]) and tf-weighted ties
    val docs = Seq(
      (1L, "the cat sat on the mat with the catapult"),
      (2L, "aaaa aaa banana bandana the theme there"),
      (3L, "low lower lowest newer newest widest wide"),
      (4L, "the the the cat cat mat aaaa theme")
    ).toDF("doc_id", "text").repartition(2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val distributed = rows(CorpusOps.bpeTrain(docs, "text", steps = 12))
    val driverSide = rows(CorpusOps.bpeTrainDriverSide(docs, "text", steps = 12))
    assert(driverSide == distributed)
    assert(distributed.size == 12)
    // the maxVocab guard fails loud, not silently-truncated
    val e = intercept[IllegalArgumentException](
      CorpusOps.bpeTrainDriverSide(docs, "text", steps = 2, maxVocab = 3))
    assert(e.getMessage.contains("maxVocab"))
  }
}
