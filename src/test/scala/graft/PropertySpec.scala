package graft

import graft.operators.{DedupOps, GraphOps, JoinOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based equivalence: the scalable operator implementations must
  * agree with brute-force reference computations on randomized inputs.
  * Deterministic ScalaCheck seeds keep CI stable while still exercising
  * shapes no hand-written case covers (duplicate timestamps, empty keys,
  * adversarial bucket boundaries, disconnected graphs).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collect { case Some(v) => v }
      .take(n).toSeq

  test("rangeJoin equals the naive inequality join on random intervals") {
    val pointGen = Gen.chooseNum(-1000L, 1000L)
    val ivGen = for {
      s <- Gen.chooseNum(-1000L, 1000L)
      len <- Gen.chooseNum(0L, 120L)
    } yield (s, s + len)
    for (seed <- 1L to 3L) {
      val points = sample(pointGen, 300, seed * 1000).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val ivs = sample(ivGen, 60, seed * 2000).zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }.toDF("iid", "s", "e")
      val naive = points.join(ivs, col("p") >= col("s") && col("p") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bucketized = JoinOps.rangeJoin(points, ivs, Nil, "p", "s", "e", bucketWidth = 128L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketized == naive, s"seed $seed: rangeJoin diverged from naive join")
    }
  }

  test("containmentPairs equals the quadratic reference with the same rare-shingle rule") {
    val wordGen = Gen.oneOf((1 to 30).map(i => s"w$i"))
    val docGen = Gen.chooseNum(3, 14).flatMap(len => Gen.listOfN(len, wordGen).map(_.mkString(" ")))
    for (seed <- 1L to 3L) {
      val texts = sample(docGen, 40, seed * 5000)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val n = 3; val maxDf = 8; val thr = 0.5
      // reference: shingle sets on strings, rare-shingle candidates, exact containment
      def sh(t: String): Set[String] = {
        val tk = t.split(" ").toSeq
        if (tk.length <= n) Set(tk.mkString(" "))
        else tk.sliding(n).map(_.mkString(" ")).toSet
      }
      val sets = texts.zipWithIndex.map { case (t, i) => (i.toLong, sh(t)) }
      val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        shared = sa intersect sb
        if shared.exists(g => df(g) <= maxDf)
        c = shared.size.toDouble / math.min(sa.size, sb.size)
        if c >= thr
      } yield (a, b)).toSet
      val got = DedupOps.containmentPairs(docs, "text", "doc_id", thr, n, maxDf)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"seed $seed: containment diverged (got ${got.size} vs ${expected.size})")
    }
  }

  test("editDistancePairs equals quadratic levenshtein on random near-collision strings") {
    // alphabet of 3 chars and short lengths force many distance-1 pairs,
    // plus transposition false-candidates the verify must reject
    val strGen = Gen.chooseNum(2, 6).flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) => if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seed <- 1L to 3L) {
      val strs = sample(strGen, 60, seed * 4000).distinct
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val expected = (for {
        (a, ia) <- strs.zipWithIndex; (b, ib) <- strs.zipWithIndex
        if ia < ib && lev(a, b) <= 1
      } yield (ia.toLong, ib.toLong)).toSet
      val got = DedupOps.editDistancePairs(df, "s", "id")
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"seed $seed: got ${got.size} expected ${expected.size}")
    }
  }

  test("mergeIntervals (window form) equals the typed flatMapGroups twin on random intervals") {
    import graft.operators.IntervalOps
    val ivGen = for {
      k <- Gen.chooseNum(1L, 5L)
      s <- Gen.chooseNum(0L, 300L)
      len <- Gen.chooseNum(1L, 60L)
    } yield IntervalOps.Interval(k, s, s + len)
    for (seed <- 1L to 3L) {
      val ivs = sample(ivGen, 120, seed * 1700)
      val df = ivs.toDF("k", "s", "e")
      val window = IntervalOps.mergeIntervals(df, "k", "s", "e")
        .select("k", "island", "s", "e", "n").orderBy("k", "island")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      implicit val sp = spark
      val typed = IntervalOps.mergeIntervalsTyped(ivs.toDS())
        .collect().sortBy(m => (m.k, m.island))
        .map(m => (m.k, m.island, m.s, m.e, m.n)).toSeq
      assert(window == typed, s"seed $seed: window and typed interval merge diverged")
    }
  }

  test("resampleFfill equals a sequential reference on random sparse series") {
    val evGen = for {
      k <- Gen.chooseNum(1L, 4L)
      b <- Gen.chooseNum(100L, 140L)
      v <- Gen.chooseNum(1, 50)
    } yield (k, b, v.toDouble)
    for (seed <- 1L to 3L) {
      val rows = sample(evGen, 60, seed * 9000)
      val df = rows.toDF("k", "b", "v")
      val got = graft.operators.ResampleOps
        .resampleFfill(df, "k", col("b"), Seq("sv" -> sum("v")))
        .select("k", "bucket", "n", "sv", "gap").orderBy("k", "bucket")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
      val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (k, rs) =>
        val byB = rs.groupBy(_._2).view.mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
        val (lo, hi) = (rs.map(_._2).min, rs.map(_._2).max)
        var lastSum = 0.0
        (lo to hi).map { b =>
          byB.get(b) match {
            case Some((cnt, s)) => lastSum = s; (k, b, cnt, s, false)
            case None => (k, b, 0L, lastSum, true)
          }
        }
      }
      assert(got == expected, s"seed $seed: resample diverged")
    }
  }

  test("mixtureSample keeps exactly the md5-threshold set a sequential reference computes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val keyGen = Gen.chooseNum(1L, 100000L)
    for (seed <- 1L to 3L) {
      val ids = sample(keyGen, 300, seed * 7700).distinct
      val rows = ids.map(id => (id, s"s${(id % 3).toInt}"))
      val df = rows.toDF("id", "src")
      val targets = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
      val got = graft.operators.SplitOps.mixtureSample(df, "id", "src", targets)
        .select("id").as[Long].collect().toSet
      // sequential replication of the operator contract
      val counts = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val nTotal = targets.map { case (s, t) => counts.getOrElse(s, 0).toDouble / t }.min
      val thr = targets.map { case (s, t) =>
        s -> math.floor(math.min(1.0, t * nTotal / counts(s)) * 65536).toInt
      }
      val expected = rows.filter { case (id, s) =>
        thr(s) >= 65536 || md5hex(id.toString).substring(0, 4) < "%04x".format(thr(s))
      }.map(_._1).toSet
      assert(got == expected, s"seed $seed: kept ${got.size} expected ${expected.size}")
    }
  }

  test("asofBackward/Forward equal brute-force nearest-row lookups") {
    val rowGen = for {
      k <- Gen.oneOf("k1", "k2", "k3")
      t <- Gen.chooseNum(0L, 200L)
    } yield (k, t)
    for (seed <- 1L to 3L) {
      val lrows = sample(rowGen, 80, seed * 300)
      val rrows = sample(rowGen, 80, seed * 700).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toDouble) }
      // make left rows unique on (k, t) so expected values are well-defined
      val left = lrows.distinct.toDF("k", "t")
      val right = rrows.toDF("k", "rt", "v")
      def expected(forward: Boolean): Map[(String, Long), Option[Double]] =
        lrows.distinct.map { case (k, t) =>
          val cands = rrows.filter { case (rk, rt, _) => rk == k && (if (forward) rt >= t else rt <= t) }
          // operator tie-break: the window fill keeps the LAST right row in
          // sort order among equal timestamps — max v at the chosen ts here
          val best =
            if (cands.isEmpty) None
            else {
              val ts = if (forward) cands.map(_._2).min else cands.map(_._2).max
              Some(cands.filter(_._2 == ts).map(_._3).max)
            }
          (k, t) -> best
        }.toMap
      def run(forward: Boolean): Map[(String, Long), Option[Double]] = {
        val f = if (forward) JoinOps.asofForward _ else JoinOps.asofBackward _
        f(left, right, Seq("k"), "t", "rt", Map("v" -> "av"))
          .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
          .toMap
      }
      assert(run(forward = false) == expected(forward = false), s"seed $seed: backward diverged")
      assert(run(forward = true) == expected(forward = true), s"seed $seed: forward diverged")
    }
  }

  test("connectedComponents equals brute-force union-find on random graphs") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 40L)
      b <- Gen.chooseNum(0L, 40L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (seed <- 1L to 3L) {
      val edges = sample(edgeGen, 50, seed * 123).distinct
      val expected = {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
      }
      val got = GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed: components diverged")
    }
  }

  test("bucketPairs path (small + overflow) enumerates exactly C(m,2) per bucket") {
    for ((m, cap) <- Seq((5, 64), (80, 16), (130, 64))) {
      val docs = (0 until m).map(i => (i.toLong, "identical content every time")).toDF("doc_id", "text")
      val n = DedupOps.exactDupPairs(docs, "text", "doc_id", maxBucketSize = cap).count()
      assert(n == m.toLong * (m - 1) / 2, s"m=$m cap=$cap: got $n pairs")
    }
  }
}
