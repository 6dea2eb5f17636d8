package graft

import graft.operators.{GraphOps, RateLimitOps}
import org.apache.spark.sql.functions._

class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kcore: hand graph — K4 survives 3-core, pendant chain and triangle peel off") {
    // K4 on {1,2,3,4}; triangle {5,6,7} (2-core only); chain 4-8-9
    val k4 = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val tri = Seq((5L, 6L), (6L, 7L), (5L, 7L))
    val chain = Seq((4L, 8L), (8L, 9L))
    val edges = (k4 ++ tri ++ chain).toDF("a", "b")
    val core3 = GraphOps.kcore(edges, "a", "b", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3.keySet == Set(1L, 2L, 3L, 4L), s"3-core must be exactly K4: $core3")
    assert(core3.values.forall(_ == 3L), s"induced degrees in K4 are 3: $core3")
    val core2 = GraphOps.kcore(edges, "a", "b", 2).collect().map(_.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), "2-core keeps K4 + triangle, drops the chain")
    val core5 = GraphOps.kcore(edges, "a", "b", 5)
    assert(core5.isEmpty, "5-core of this graph is empty")
  }

  test("kcore: peeling cascade (chain of marginal nodes collapses entirely)") {
    // path graph 1-2-3-...-10: every node has deg <= 2, 2-core of a tree is empty
    // (peeling must CASCADE: leaves drop, exposing new leaves, to empty)
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    assert(GraphOps.kcore(path, "a", "b", 2).isEmpty)
    // a cycle is its own 2-core
    val cycle = ((1L until 10L).map(i => (i, i + 1)) :+ (10L, 1L)).toDF("a", "b")
    assert(GraphOps.kcore(cycle, "a", "b", 2).count() == 10)
  }

  test("token-bucket fold: hand-computed admissions") {
    // capacity 5 tokens (50s of refill), cost 1 token, refill 1/10s.
    // 7 events at t=0,1,2,...,6 seconds: bucket starts full (5 tokens);
    // events 1-5 admitted (tokens 4,3,2,1,0 + tiny refills), 6th gets
    // 0.1+0.1+... — at t=5s refill since t=4s is 1s=0.1 token → 0.5
    // tokens total < 1 → throttled; same for 7th.
    val df = (0 until 7).map(i => (1L, i * 1000000L, i.toLong)).toDF("user_id", "ts_us", "event_id")
    val out = RateLimitOps.tokenBucket(df, "user_id", "ts_us", "event_id", 50000000L, 10000000L).collect().head
    assert(out.getAs[Long]("n_events") == 7)
    assert(out.getAs[Long]("n_admitted") == 5, s"expected 5 admitted: $out")
    assert(out.getAs[Long]("n_throttled") == 2)
  }

  test("token-bucket fold: steady slow traffic is never throttled") {
    // one event every 20s >= cost refill interval — all admitted
    val df = (0 until 50).map(i => (2L, i * 20000000L, i.toLong)).toDF("user_id", "ts_us", "event_id")
    val out = RateLimitOps.tokenBucket(df, "user_id", "ts_us", "event_id", 50000000L, 10000000L).collect().head
    assert(out.getAs[Long]("n_admitted") == 50 && out.getAs[Long]("n_throttled") == 0)
  }
}
