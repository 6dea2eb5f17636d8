package graft

import graft.operators.{CorpusOps, WriteOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

class WriteOpsSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits: known Morton values and monotone range") {
    val df = Seq((3, 0), (3, 3), (0, 3), (5, 2)).toDF("a", "b")
    val got = df.select(WriteOps.interleaveBits(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // a bits even positions, b bits odd: (3,0)→0b0101=5; (3,3)→0b1111=15;
    // (0,3)→0b1010=10; (5,2)→a=101,b=010→z=0b011001=25? compute: a0=1→bit0,
    // a1=0, a2=1→bit4; b0=0, b1=1→bit3, b2=0 → 1+8+16=25
    assert(got == Seq(5L, 15L, 10L, 25L))
  }

  test("zorderBy: per-file z-ranges are disjoint and every file covers a compact box") {
    val n = 4096
    val df = (0 until n).map(i => (i % 64, i / 64)).toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    WriteOps.zorderBy(df, "x", "y", numFiles = 8).write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .withColumn("z", WriteOps.interleaveBits(col("x"), col("y")))
      .withColumn("f", input_file_name())
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("cnt"))
      .orderBy("lo")
      .as[(String, Long, Long, Long)].collect()
    assert(ranges.length == 8)
    assert(ranges.map(_._4).sum == n)
    // range partitioning on z → file z-ranges must not overlap
    ranges.sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2); case _ => }
    // compactness: each file's z-span is far below the full z-domain
    val domain = ranges.map(_._3).max - ranges.map(_._2).min
    ranges.foreach { r => assert(r._3 - r._2 <= domain / 4) }
  }

  test("writeWithMetrics: aggregates ride the write job, no second scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-obs").toString
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(4.0))).toDF("id", "v")
    val m = WriteOps.writeWithMetrics(df, tmp,
      "n" -> count(lit(1)),
      "nulls_v" -> sum(when(col("v").isNull, 1L).otherwise(0L)),
      "sum_v" -> sum("v"))
    assert(m("n") == 3L && m("nulls_v") == 1L && m("sum_v") == 6.0)
    assert(spark.read.parquet(tmp).count() == 3)
  }

  test("compact: exact output file count and row preservation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val df = (1 to 1000).toDF("v")
    WriteOps.compact(df, tmp, numFiles = 3)
    val files = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3)
    assert(spark.read.parquet(tmp).count() == 1000)
  }

  test("maxRecordsPerFile splits oversized partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mrpf").toString
    WriteOps.compact((1 to 1000).toDF("v"), tmp, numFiles = 1, maxRecordsPerFile = 250)
    val files = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    assert(spark.read.parquet(tmp).count() == 1000)
  }
  test("overwritePartitions: dynamic mode replaces only the written partitions") {
    val dir = java.nio.file.Files.createTempDirectory("dynpart-spec").toString
    val base = (0L until 100L).map(i => (i, (i % 4).toInt)).toDF("id", "day")
    WriteOps.overwritePartitions(base, dir, Seq("day"))
    def filesOf(day: Int): Set[String] = {
      val p = java.nio.file.Paths.get(dir, s"day=$day")
      java.nio.file.Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val beforeDay1 = filesOf(1)
    // rerun day 2 only, with a corrected (smaller) batch
    val corrected = base.filter(col("day") === 2 && col("id") < 20)
    WriteOps.overwritePartitions(corrected, dir, Seq("day"))
    val back = spark.read.parquet(dir)
    // other partitions byte-identical (same file names), day 2 replaced
    assert(filesOf(1) == beforeDay1, "untouched partition files must survive the rerun")
    val counts = back.groupBy("day").count().as[(Int, Long)].collect().toMap
    assert(counts == Map(0 -> 25L, 1 -> 25L, 3 -> 25L, 2 -> 5L))
    // the session's overwrite mode is restored afterwards
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").contains("dynamic") ||
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").isEmpty)
  }

  test("cleanHtml strips tags, decodes entities in the right order, straightens punctuation") {
    val rows = Seq(
      "<p>Hello &amp; <b>world</b></p>",
      "a &amp;lt; b",          // must become "a &lt; b", not "a < b"
      "“smart” – ‘quotes’",
      "x\t\n  y"
    ).toDF("text")
    val got = rows.select(TextFunctions.cleanHtml(col("text")).as("t")).as[String].collect().toSeq
    assert(got == Seq(
      "Hello & world",
      "a &lt; b",
      "\"smart\" - 'quotes'",
      "x y"))
  }

  test("duplicatedSpanStats counts cross-doc duplicated n-grams, brute-force checked") {
    val docs = Seq(
      (1L, "one two three four five"),     // shares "two three four" 3-gram run with doc 2
      (2L, "zero two three four five six"),
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val got = CorpusOps.duplicatedSpanStats(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_ngrams", "n_dup").orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // brute force over 3-gram strings
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = Map(1L -> grams("one two three four five"),
      2L -> grams("zero two three four five six"),
      3L -> grams("totally different words here"))
    val expected = all.toSeq.sortBy(_._1).map { case (id, g) =>
      val dup = g.count(s => all.exists { case (o, og) => o != id && og.contains(s) })
      (id, g.size.toLong, dup.toLong)
    }
    assert(got == expected)
  }
}
