package graft

import org.apache.spark.sql.functions._

/** Round-13 hardening: the round-12 advisor fixes pinned on data. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("fdrBhRandomization: a degenerate slice (one-armed observed split) is " +
    "reported NULL, never ranked, never rejected") {
    import graft.operators.StatsOps
    // 'lonely' has ONE unit — its observed md5 split necessarily leaves
    // an arm empty, obs_diff is NULL, and pre-fix the NULL comparisons
    // gave it n_ge = 0 → p = 1/65 → the MOST significant BH rank
    // (round-12 advisor item 4: a spurious FDR rejection both engines
    // agreed on, so the gate could not catch it)
    val units = (1 to 40).map(i => ("g1", i.toLong, i.toLong * 100))
      .union((1 to 40).map(i => ("g2", 1000L + i, 50L)))
      .union(Seq(("lonely", 5000L, 777L)))
      .toDF("g", "unit", "v")
    val out = StatsOps.fdrBhRandomization(units, "g", "unit", "v", "sp:", k = 64)
      .collect()
    assert(out.length == 3)
    val lonely = out.find(_.getAs[String]("g") == "lonely").get
    Seq("obs_diff", "n_ge", "p_num", "p_den", "p_value", "bh_rank", "rejected")
      .foreach(c => assert(lonely.isNullAt(lonely.fieldIndex(c)),
        s"degenerate slice must carry NULL $c: $lonely"))
    // the two real slices still rank 1..2 against m = 2 — the degenerate
    // group neither occupies a rank nor inflates m
    val ranked = out.filter(_.getAs[String]("g") != "lonely")
    assert(ranked.map(_.getAs[Long]("bh_rank")).sorted.toSeq == Seq(1L, 2L))
    assert(ranked.forall(_.getAs[Long]("p_den") == 65L))
  }

  test("knBigramDocScores: every scored doc gets a FINITE cross-entropy " +
    "(p_kn floored, no ln(0) NULL dropout)") {
    import graft.operators.CorpusOps
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran off the mat"),
      (3L, "a dog sat on a log")).toDF("doc_id", "text")
    val got = CorpusOps.knBigramDocScores(docs, "doc_id", "text").collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("cross_entropy_nats")), s"NULL H: $r")
      val h = r.getAs[Double]("cross_entropy_nats")
      // the 1e-6 floor caps any bigram's surprisal at -ln(1e-6) ≈ 13.816
      assert(h > 0.0 && h <= 13.816, s"H out of the clamped range: $r")
    }
  }
}
