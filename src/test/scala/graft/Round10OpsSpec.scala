package graft

import graft.operators.SimilarityOps
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
}
