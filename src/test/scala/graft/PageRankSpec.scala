package graft

import graft.operators.GraphOps

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: sink node accumulates rank; results are run-to-run identical") {
    // star into node 4 plus a 1->2->3->1 cycle
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r1 = GraphOps.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, java.math.BigDecimal)].collect().sortBy(_._1)
    val r2 = GraphOps.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, java.math.BigDecimal)].collect().sortBy(_._1)
    // decimal arithmetic → bit-identical across runs (double PR is not)
    assert(r1.map(_._2) sameElements r2.map(_._2))
    val ranks = r1.map { case (id, r) => id -> BigDecimal(r) }.toMap
    // the pure sink gets the most rank; mass is ≤ 1 (dangling leak only)
    assert(ranks(4L) == ranks.values.max)
    assert(ranks.values.sum <= BigDecimal(1))
    assert(ranks.values.forall(_ > 0))
  }

  test("pageRank: symmetric cycle gives equal ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iterations = 4)
      .as[(Long, java.math.BigDecimal)].collect()
    assert(r.map(_._2).distinct.length == 1)
  }
}
