package graft

import graft.operators.IncrementalDedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main: stage timing of the incremental-dedup index build
  * and probe across scales (not part of the API). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def textOf(seed: org.apache.spark.sql.Column, vocab: Long) = concat_ws(" ",
      ((0 until 23).map(j => concat(lit("w"), pmod(seed * (j + 7) + j, lit(vocab)))) :+
        concat(lit("u"), seed)): _*)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    for (rows <- Seq(500000L, 2000000L)) {
      val nBuckets = math.max(8, (rows / 125000).toInt)
      val base = spark.range(rows).select(col("id"), textOf(col("id"), rows).as("text"))
      val batch = spark.range(rows / 20).select(
        (col("id") + 3000000000L).as("id"),
        when(pmod(col("id"), lit(2)) === 0, textOf(pmod(col("id") * 37, lit(rows)), rows))
          .otherwise(textOf(col("id") + 2000000000L, rows)).as("text"))
      val idx = time(s"buildIndex rows=$rows b=$nBuckets")(
        IncrementalDedupOps.buildIndex(base, "text", "id", "dev_inc_idx",
          numBuckets = nBuckets, shingleSize = 3, numBands = 8, rowsPerBand = 4))
      val n = time(s"probe rows=${rows / 20}")(
        IncrementalDedupOps.probe(batch, "text", "id", idx,
          threshold = 0.9, shingleSize = 3, numBands = 8, rowsPerBand = 4).count())
      println(s"[probe] pairs=$n")
      // stage decomposition
      import graft.operators.DedupOps
      val k = 32
      val newDocs = batch.select(col("id"), DedupOps.hashedShingleSet(col("text"), 3).as("sh")).localCheckpoint()
      val newBands = newDocs.select(col("id"),
        explode(DedupOps.bandKeys(DedupOps.minhashSigCol(col("sh"), k), 8, 4)).as("band_key"))
      time("  newBands count")(newBands.count())
      val cross = newBands.as("n").join(spark.table(idx.bands).as("b"), col("n.band_key") === col("b.band_key"))
        .filter(col("n.id") =!= col("b.id"))
        .select(least(col("n.id"), col("b.id")).as("a"), greatest(col("n.id"), col("b.id")).as("b"))
      time("  crossCands count")(cross.count())
      time("  crossCands distinct")(cross.distinct().count())
      val sigsJoin = cross.distinct().join(spark.table(idx.sigs).withColumnRenamed("id", "sid"), col("a") === col("sid"), "left")
      time("  one sigs left-join")(sigsJoin.count())
    }
    spark.stop()
  }
}
