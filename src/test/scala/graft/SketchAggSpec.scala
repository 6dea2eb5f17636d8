package graft

import graft.functions.SketchAggregates
import org.apache.spark.sql.functions._

/** Misra-Gries mergeable-aggregate contracts (Misra & Gries '82;
  * Agarwal et al. PODS'12 merge rule), pinned on adversarial data the
  * driver's uniform-ish corpus can't exercise.
  */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private def mgMap(df: org.apache.spark.sql.DataFrame, colName: String, k: Int): Map[String, Long] =
    df.agg(SketchAggregates.misraGries(col(colName), k).as("mg"))
      .select(explode(col("mg")).as(Seq("key", "cnt")))
      .as[(String, Long)].collect().toMap

  test("exact when distinct keys fit in k counters (merge across 8 partitions)") {
    val rows = (0 until 5000).map(i => s"key${i % 20}")
    val df = rows.toDF("tok").repartition(8)
    val got = mgMap(df, "tok", 64)
    val want = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(got == want)
  }

  test("zipf stream: every key above n/(k+1) survives, counts within the MG band") {
    // zipf-ish: key j appears ~N/(j+1) times, 400 distinct keys, k=32 —
    // the sketch must evict aggressively and still keep the heavy head
    val rows = (0 until 400).flatMap(j => Seq.fill(20000 / (j + 1))(f"w$j%03d"))
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(rows)
    val n = shuffled.size.toLong
    val k = 32
    val truth = shuffled.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val got = mgMap(shuffled.toDF("tok").repartition(8), "tok", k)
    val thresh = n / (k + 1)
    truth.filter(_._2 > thresh).foreach { case (key, c) =>
      assert(got.contains(key), s"$key has freq $c > n/(k+1)=$thresh but was evicted")
    }
    got.foreach { case (key, c) =>
      val t = truth(key)
      assert(c <= t, s"$key: sketch count $c exceeds true $t")
      assert(c >= t - thresh, s"$key: sketch count $c below true-n/(k+1)=${t - thresh}")
    }
    assert(got.size <= k)
  }

  test("long keys work and nulls are ignored") {
    val df = Seq[Option[Long]](Some(1L), Some(1L), Some(2L), None, Some(1L))
      .toDF("id")
    val got = df.agg(SketchAggregates.misraGries(col("id"), 8).as("mg"))
      .select(explode(col("mg")).as(Seq("key", "cnt")))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }
}
