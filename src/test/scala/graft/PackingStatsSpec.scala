package graft

import graft.operators.{CorpusOps, ExportOps, JoinOps, PackingOps, StatsOps}
import org.apache.spark.sql.functions._

/** Round-4 additions: sequence packing, z-score, rare postings, nearest
  * as-of. */
class PackingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences equals a sequential per-shard packer (concatenate-then-chop)") {
    val rows = (1L to 200L).map(i => (i, (i * 7 % 90).toInt))
    val df = rows.toDF("id", "n")
    val got = PackingOps.packSequences(df, "id", col("n"), windowTokens = 64L,
        shardCol = pmod(col("id"), lit(4)))
      .select("id", "shard", "start_off", "first_win", "last_win")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // sequential reference: per shard in id order, running offset
    val offsets = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    rows.sortBy(_._1).foreach { case (id, n) =>
      val shard = id % 4
      val start = offsets(shard)
      val end = start + n
      val firstWin = start / 64
      val lastWin = if (n == 0) firstWin else (end - 1) / 64
      val g = got(id)
      assert((g._2, g._3, g._4, g._5) == (shard, start, firstWin, lastWin), s"doc $id")
      offsets(shard) = end
    }
  }

  test("packSequences: empty docs occupy zero tokens and never shift the stream") {
    val df = Seq((1L, 10), (2L, 0), (3L, 10)).toDF("id", "n")
    val got = PackingOps.packSequences(df, "id", col("n"), windowTokens = 16L, shardCol = lit(0))
      .orderBy("id").select("start_off", "first_win", "last_win", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L, 1L), (10L, 0L, 0L, 1L), (10L, 0L, 1L, 2L)))
  }

  test("permutation equals a driver-side sort by md5 key; stable across partitionings") {
    val ids = (0L until 300L).toSeq
    val df = ids.toDF("id")
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = ids.sortBy(i => (md5hex(s"7:$i"), i)).zipWithIndex
      .map { case (id, i) => (id, i + 1L) }.toMap
    val got = ExportOps.permutation(df, "id", seed = "7")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got == expected)
    // bucket-parallel position assignment must not depend on layout
    val re = ExportOps.permutation(df.repartition(7), "id", seed = "7", bucketHexChars = 1)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(re == expected)
    // a different seed is a different permutation (not identity-correlated)
    val other = ExportOps.permutation(df, "id", seed = "8")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(other != expected)
  }

  test("permutation rejects reserved helper column names") {
    val df = Seq((1L, "x")).toDF("id", "__k")
    val e = intercept[IllegalArgumentException](ExportOps.permutation(df, "id", "s"))
    assert(e.getMessage.contains("__k"))
  }

  test("exportShuffled: one file per chunk, contiguous position ranges, rows conserved") {
    val dir = java.nio.file.Files.createTempDirectory("export-spec").toString
    val df = (0L until 250L).map(i => (i, s"doc$i")).toDF("id", "body")
    ExportOps.exportShuffled(df, "id", seed = "42", dir, rowsPerFile = 100L)
    val back = spark.read.parquet(dir)
      .select(col("chunk").cast("long").as("chunk"), col("pos"), input_file_name().as("f"))
    val layout = back.groupBy("chunk")
      .agg(count(lit(1)).as("n"), min("pos").as("minp"), max("pos").as("maxp"),
        countDistinct(col("f")).as("nf"))
      .orderBy("chunk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(layout == Seq((0L, 100L, 1L, 100L, 1L), (1L, 100L, 101L, 200L, 1L), (2L, 50L, 201L, 250L, 1L)))
    // original columns survive the export
    assert(spark.read.parquet(dir).columns.toSet == Set("id", "body", "pos", "chunk"))
  }

  test("exportWithManifest: commit marker lands last and the manifest detects a lost file") {
    val dir = java.nio.file.Files.createTempDirectory("export-manifest").toString
    val df = (0L until 250L).map(i => (i, s"doc$i")).toDF("id", "body")
    ExportOps.exportWithManifest(df, "id", seed = "42", dir, rowsPerFile = 100L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_COMMIT")))
    def recompute() = ExportOps.chunkStats(spark.read.parquet(s"$dir/data"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val manifest = spark.read.json(s"$dir/manifest")
      .select("chunk", "n", "min_pos", "max_pos", "fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(manifest == recompute() && manifest.size == 3)
    // drop one chunk's parquet file: the re-read stats must now disagree
    val lost = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      .filter(p => p.toString.contains("chunk=1") && p.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.delete(lost)
    assert(manifest != recompute(), "a lost data file must break the manifest match")
  }

  test("zscore standardizes per group; degenerate groups yield null") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("g", "x")
    val got = StatsOps.zscore(df, Seq("g"), col("x"))
      .orderBy("g", "x").select("g", "x", "z")
      .as[(String, Double, Option[Double])].collect().toSeq
    // group a: mean 2, sample sd sqrt(2) → z = ±1/sqrt(2)
    val z = 1.0 / math.sqrt(2.0)
    assert(got(0)._3.get == -z && got(1)._3.get == z)
    assert(got(2)._3.isEmpty, "single-row group has sd 0 → z null")
    // null x rows are excluded from moments and get z null
    val withNull = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None)).toDF("g", "x")
    val g2 = StatsOps.zscore(withNull, Seq("g"), col("x"))
      .filter(col("x").isNull).select("z").as[Option[Double]].collect()
    assert(g2.toSeq == Seq(None))
  }

  test("zscore rejects input columns that collide with its reserved helper names") {
    val df = Seq(("a", 1.0, 0.0)).toDF("g", "x", "__mean")
    val e = intercept[IllegalArgumentException](StatsOps.zscore(df, Seq("g"), col("x")))
    assert(e.getMessage.contains("__mean"))
    val e2 = intercept[IllegalArgumentException](
      StatsOps.zscore(Seq(("a", 1.0)).toDF("g", "x"), Seq("g"), col("x"), outCol = "__sd"))
    assert(e2.getMessage.contains("__sd"))
  }

  test("zscore keeps null-keyed groups (null-safe join back)") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 5.0), (None, 7.0))
      .toDF("g", "x")
    val got = StatsOps.zscore(df, Seq("g"), col("x"))
    assert(got.count() == 4, "null group rows must survive the join back")
    val z = got.filter(col("g").isNull).orderBy("x").select("z").as[Double].collect()
    assert(math.abs(z(0) + 1.0 / math.sqrt(2)) < 1e-12, "null group standardized within itself")
  }

  test("rarePostings: df filter precedes collection; lists are sorted and bounded") {
    val docs = Seq(
      (3L, "x y z common common2"),
      (1L, "x y z other words"),
      (2L, "totally different text here")
    ).toDF("doc_id", "text")
    val got = CorpusOps.rarePostings(docs, "doc_id", "text", n = 3, maxDf = 2)
      .as[(String, Long, String)].collect().map(g => g._1 -> (g._2, g._3)).toMap
    // "x y z" appears in docs 1 and 3 → df=2, postings sorted ascending
    assert(got("x y z") == (2L, "1,3"))
    // every list bounded by maxDf
    assert(got.values.forall(_._2.split(",").length <= 2))
  }

  test("meanPool equals a sequential per-position mean and is repartition-stable") {
    val rows = (1 to 60).map(i => (i % 4, Array.tabulate(8)(j => (i * 31 + j * 7) % 100 / 100.0)))
    val df = rows.toDF("grp", "vec")
    def run(parts: Int) = graft.operators.SimilarityOps
      .meanPool(df.repartition(parts), "grp", "vec")
      .orderBy("grp")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
    val got = run(4)
    val ref = rows.groupBy(_._1).view.mapValues { vs =>
      (0 until 8).map(j => vs.map(_._2(j)).sum / vs.size)
    }.toMap
    got.foreach { case (g, vec) =>
      vec.zip(ref(g)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"group $g") }
    }
    // decimal sums are order-independent: different partitioning must
    // give BIT-identical pooled vectors (replay stability)
    assert(run(1) == got && run(13) == got)
  }

  test("asofNearest picks the closer direction, ties prefer backward") {
    val left = Seq(("k", 100L, "a"), ("k", 210L, "b"), ("k", 305L, "c")).toDF("k", "t", "tag")
    val right = Seq(("k", 90L, 1.0), ("k", 200L, 2.0), ("k", 300L, 3.0), ("k", 310L, 4.0))
      .toDF("k", "rt", "v")
    val got = JoinOps.asofNearest(left, right, Seq("k"), "t", "rt", Map("v" -> "nv"))
      .orderBy("t").select("t", "nv").as[(Long, Double)].collect().toSeq
    // t=100: back 90 (d=10) vs fwd 200 (d=100) → 1.0
    // t=210: back 200 (d=10) vs fwd 300 (d=90) → 2.0
    // t=305: back 300 (d=5) vs fwd 310 (d=5) → tie → backward 3.0
    assert(got == Seq((100L, 1.0), (210L, 2.0), (305L, 3.0)))
  }

  test("asofNearest tolerance bounds both directions") {
    val left = Seq(("k", 100L, "a")).toDF("k", "t", "tag")
    val right = Seq(("k", 10L, 1.0), ("k", 250L, 2.0)).toDF("k", "rt", "v")
    val out = JoinOps.asofNearest(left, right, Seq("k"), "t", "rt", Map("v" -> "nv"),
      tolerance = Some(50L)).collect().head
    assert(out.getAs[Any]("nv") == null, "both candidates beyond 50 → null")
    val in = JoinOps.asofNearest(left, right, Seq("k"), "t", "rt", Map("v" -> "nv"),
      tolerance = Some(95L)).collect().head
    assert(in.getAs[Double]("nv") == 1.0, "back at d=90 within 95, fwd at 150 out → back")
  }

  test("asofNearest reuses a caller-carried right-time column for the distance") {
    val left = Seq(("k", 100L, "a")).toDF("k", "t", "tag")
    val right = Seq(("k", 90L, 1.0), ("k", 300L, 2.0)).toDF("k", "rt", "v")
    val out = JoinOps.asofNearest(left, right, Seq("k"), "t", "rt",
      Map("v" -> "nv", "rt" -> "matched_rt")).collect().head
    assert(out.getAs[Double]("nv") == 1.0 && out.getAs[Long]("matched_rt") == 90L)
  }
}
