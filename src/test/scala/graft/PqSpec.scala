package graft

import graft.functions.PqFunctions
import org.apache.spark.sql.functions._

/** Native PQ kernel contracts: the codegen loops must replicate the
  * HOF/SQL-mirrorable math bit-for-bit (left-to-right double folds,
  * first strict minimum) — the property that lets `ann_pq_adc` swap the
  * interpreted form for PqKernel without moving the recall invariant.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val J = 4; private val C = 8; private val K = 4
  private val cb = (for (j <- 0 until J; c <- 0 until C; kk <- 0 until K)
    yield ((j * 13 + c * 7 + kk * 3) % 101 - 50) / 50.0).toArray

  private def refCodes(v: Array[Double]): Seq[Int] =
    (0 until J).map { j =>
      var best = Double.MaxValue; var idx = -1
      for (c <- 0 until C) {
        var dist = 0.0
        for (kk <- 0 until K) {
          val diff = v(j * K + kk) - cb((j * C + c) * K + kk)
          dist += diff * diff
        }
        if (dist < best) { best = dist; idx = c }
      }
      idx
    }

  private val vecs = (0 until 200).map { i =>
    (i.toLong, (0 until J * K).map(p => ((i * 31 + p * 17) % 201 - 100) / 100.0).toArray)
  }

  test("PqCodes matches the scalar reference on every vector") {
    val got = vecs.toDF("id", "v")
      .select(col("id"), PqFunctions.pqCodes(col("v"), cb, J, C).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refCodes(v), s"vector $id: codes ${got(id)} != ${refCodes(v)}")
    }
  }

  test("PqAdc equals the exact distance to the reconstruction") {
    val df = vecs.toDF("id", "v")
      .withColumn("codes", PqFunctions.pqCodes(col("v"), cb, J, C))
      .withColumn("adc", PqFunctions.pqAdc(col("v"), col("codes"), cb, J, C))
      .as[(Long, Seq[Double], Seq[Int], Double)].collect()
    df.foreach { case (id, v, codes, adc) =>
      var want = 0.0
      for (j <- 0 until J; kk <- 0 until K) {
        val diff = v(j * K + kk) - cb((j * C + codes(j)) * K + kk)
        want += diff * diff
      }
      assert(adc == want, s"vector $id: adc $adc != $want (must be bit-identical)")
    }
  }

  test("float input works and matches the double path") {
    val f = vecs.take(50).map { case (id, v) => (id, v.map(_.toFloat)) }
    val gotF = f.toDF("id", "v")
      .select(col("id"), PqFunctions.pqCodes(col("v"), cb, J, C).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    f.foreach { case (id, v) =>
      assert(gotF(id) == refCodes(v.map(_.toDouble)))
    }
  }
}
