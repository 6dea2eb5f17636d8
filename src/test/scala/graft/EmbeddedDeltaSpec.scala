package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.Pipeline
import graft.sources.{EmbeddedCommitLog, UnsupportedSourceInEnv}

/** `delta://` against the embedded commit-log backend (round-12 verdict
  * item 7: the Delta OSS jar cannot be vendored into this zero-egress
  * image, so the scheme exercises REAL transaction-log semantics —
  * atomic append/overwrite commits, snapshot reads, versionAsOf time
  * travel, optimistic version races — instead of throwing). */
class EmbeddedDeltaSpec extends SparkSpec {

  private def freshTable(): String = {
    val d = Files.createTempDirectory("graft_edelta").toString
    Files.deleteIfExists(Paths.get(d)) // the writer creates it
    d
  }

  test("delta:// e2e through the ETL pipeline: append, append, overwrite, time travel") {
    val tbl = freshTable()
    def write(values: String, mode: String): Unit = {
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", s"values:///?header=a:int,b&values=$values",
        "--sink", s"delta://$tbl?embedded=true&mode=$mode"))
      assert(p.run(spark), s"write $values ($mode) must succeed")
    }
    write("1,x;2,y", "append")  // v0
    write("3,z", "append")      // v1
    def readBack(q: String): Seq[(Int, String)] = {
      val (r, _) = Pipeline.fromArgs(Seq("--source", s"delta://$tbl?$q"))
      r.resultView(spark, "source").orderBy("a").collect()
        .map(x => (x.getInt(0), x.getString(1))).toSeq
    }
    assert(readBack("embedded=true") == Seq((1, "x"), (2, "y"), (3, "z")))
    assert(readBack("embedded=true&versionAsOf=0") == Seq((1, "x"), (2, "y")),
      "time travel to v0 must see only the first commit")
    write("9,w", "overwrite")   // v2 replaces the live set
    assert(readBack("embedded=true") == Seq((9, "w")))
    assert(readBack("embedded=true&versionAsOf=1") == Seq((1, "x"), (2, "y"), (3, "z")),
      "historical versions stay reproducible after an overwrite")
  }

  test("without the embedded opt-in, delta:// still degrades loudly") {
    val tbl = freshTable()
    val (p, _) = Pipeline.fromArgs(Seq(
      "--source", "values:///?header=a:int&values=1",
      "--sink", s"delta://$tbl"))
    intercept[UnsupportedSourceInEnv] { p.run(spark) }
  }

  test("optimistic concurrency: an append losing the race re-reads and lands next") {
    import spark.implicits._
    val tbl = freshTable()
    val v0 = EmbeddedCommitLog.write(Seq((1, "a")).toDF("a", "b"), tbl, overwrite = false)
    assert(v0 == 0)
    // a concurrent writer lands version 1 INSIDE the race window (after
    // this writer selected 1, before its atomic link): the commit must
    // NOT clobber it (POSIX rename would) — it re-reads and lands at 2
    EmbeddedCommitLog.raceInjection = () =>
      Files.writeString(Paths.get(tbl, "_graft_log", "00000001.json"),
        """{"version":1,"action":"append","files":[]}""")
    val v2 = EmbeddedCommitLog.write(Seq((2, "b")).toDF("a", "b"), tbl, overwrite = false)
    assert(v2 == 2, s"racer must land at version 2, got $v2")
    val live = EmbeddedCommitLog.filesAt(tbl, None)
    assert(live.size == 2, s"both real commits' files must be live: $live")
  }

  test("a reader never sees a half commit: staged orphans are invisible") {
    import spark.implicits._
    val tbl = freshTable()
    EmbeddedCommitLog.write(Seq((1, "a")).toDF("a", "b"), tbl, overwrite = false)
    // a crashed writer's leftovers: a data file the log never references
    Seq((99, "junk")).toDF("a", "b").write.parquet(s"$tbl/_staging_dead")
    val rows = EmbeddedCommitLog.read(spark, tbl, None).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1),
      "unreferenced staging data must never surface in a read")
  }

  test("two writers racing appends serialize with no lost commit") {
    import spark.implicits._
    val tbl = freshTable()
    EmbeddedCommitLog.write(Seq((0, "seed")).toDF("a", "b"), tbl, overwrite = false)
    val perThread = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 2).map { t =>
      Future {
        (1 to perThread).map { i =>
          EmbeddedCommitLog.write(
            Seq((t * 100 + i, s"w$t-$i")).toDF("a", "b"), tbl, overwrite = false)
        }
      }
    }
    val versions = fs.flatMap(Await.result(_, 120.seconds))
    val all = (Seq(0) ++ versions).sorted
    assert(all == (0 to 2 * perThread).toList,
      s"every writer must land a DISTINCT consecutive version: $all")
    val rows = EmbeddedCommitLog.read(spark, tbl, None).collect()
    assert(rows.length == 1 + 2 * perThread,
      s"no commit may be lost: ${rows.length} rows")
  }

  test("an overwrite that loses a version race aborts instead of " +
    "dropping the commit it raced") {
    import spark.implicits._
    val tbl = freshTable()
    EmbeddedCommitLog.write(Seq((1, "a")).toDF("a", "b"), tbl, overwrite = false)
    // a concurrent writer lands version 1 inside the race window; this
    // overwrite decided its file set without observing it — real Delta
    // aborts conflicting overwrites the same way
    EmbeddedCommitLog.raceInjection = () =>
      Files.writeString(Paths.get(tbl, "_graft_log", "00000001.json"),
        """{"version":1,"action":"append","files":[]}""")
    intercept[java.util.ConcurrentModificationException] {
      EmbeddedCommitLog.write(Seq((2, "b")).toDF("a", "b"), tbl, overwrite = true)
    }
  }

  test("log checkpoints bound replay and keep time travel below them") {
    import spark.implicits._
    val tbl = freshTable()
    val n = EmbeddedCommitLog.checkpointInterval + 3 // crosses one roll
    (0 until n).foreach { i =>
      EmbeddedCommitLog.write(Seq((i, s"r$i")).toDF("a", "b"), tbl, overwrite = false)
    }
    val ckptV = EmbeddedCommitLog.checkpointInterval - 1
    assert(Files.exists(Paths.get(tbl, "_graft_log", f"$ckptV%08d.checkpoint")),
      s"a checkpoint must roll at version $ckptV")
    // latest resolves through the checkpoint (replay ≤ interval commits)
    val latest = EmbeddedCommitLog.read(spark, tbl, None).collect()
    assert(latest.map(_.getInt(0)).sorted.toSeq == (0 until n),
      "the checkpointed read must see every commit")
    // time travel BELOW the checkpoint replays raw history
    val early = EmbeddedCommitLog.read(spark, tbl, Some(2)).collect()
    assert(early.map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2),
      "versions below the checkpoint stay reproducible")
    // at exactly the checkpoint version, the checkpoint IS the answer
    val at = EmbeddedCommitLog.read(spark, tbl, Some(ckptV)).collect()
    assert(at.map(_.getInt(0)).sorted.toSeq == (0 to ckptV),
      "the checkpoint version itself must resolve")
  }
}
