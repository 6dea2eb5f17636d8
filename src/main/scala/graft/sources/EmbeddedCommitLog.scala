package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded file-backed commit-log table format — the `delta://` seam's
  * in-container backend (round-12 verdict item 7: the Delta OSS jar is
  * not vendorable in this zero-egress image — no artifact exists in any
  * local cache — so the scheme's COMMIT-LOG SEMANTICS are exercised
  * against this minimal transaction log instead of throwing
  * UnsupportedSourceInEnv; the RegistryClientFactory seam precedent).
  *
  * What it implements (the Delta core a pipeline actually relies on):
  *  - a table = data files + an ordered log of JSON commits under
  *    `_graft_log/` (`00000000.json`, `00000001.json`, …), each commit
  *    recording `append` (adds files) or `overwrite` (replaces the live
  *    file set);
  *  - ATOMIC commits: data files are staged first, the commit file
  *    lands last via createLink (create-new semantics) — a reader
  *    never sees half a commit, a crashed writer leaves only orphaned
  *    staging files the log never references;
  *  - optimistic concurrency: an APPEND losing a version race RE-READS
  *    the log (not merely +1 — two concurrent winners could both land
  *    ahead) and retries at the next free version — appends serialize,
  *    they do not clobber. An OVERWRITE that loses a race ABORTS with
  *    ConcurrentModificationException, matching real Delta's conflict
  *    rule: the overwrite's file set was decided without observing the
  *    commit it lost to, so landing it would silently drop that commit;
  *  - snapshot reads + TIME TRAVEL: a read resolves the file set by
  *    replaying the log up to `versionAsOf` (default: latest), so
  *    readers are isolated from concurrent appends and any historical
  *    version stays reproducible (files are never deleted here — VACUUM
  *    is out of scope);
  *  - log CHECKPOINTS: every [[checkpointInterval]] commits the live
  *    file set is rolled into `NNNNNNNN.checkpoint`, and a read replays
  *    only the ≤ interval commits after the newest checkpoint at-or-
  *    below its target — a 10⁴-commit table costs O(interval) per read,
  *    not O(log). Commit files are kept, so time travel BELOW a
  *    checkpoint still replays raw history.
  *
  * NOT implemented (documented, fail-loud where reachable): MERGE/DML
  * on the log (graft's merge/diff operators cover the semantics at the
  * DataFrame layer), VACUUM, schema evolution enforcement beyond
  * parquet's own.
  */
object EmbeddedCommitLog {

  final case class Commit(version: Int, action: String, files: Seq[String])

  /** Commits between checkpoint rolls — the replay bound per read. */
  val checkpointInterval = 16

  /** Test seam: runs once inside the next write's race window (after
    * version selection, before the atomic link), then self-resets. */
  private[graft] var raceInjection: () => Unit = () => ()

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")

  private def render(c: Commit): String =
    s"""{"version":${c.version},"action":"${c.action}","files":[""" +
      c.files.map("\"" + _ + "\"").mkString(",") + "]}"

  // parser for OUR OWN one-line format above — not a general JSON reader
  private val commitRe =
    """\{"version":(\d+),"action":"(append|overwrite|checkpoint)","files":\[(.*)\]\}""".r

  private def parse(s: String): Commit = s.trim match {
    case commitRe(v, a, fs) =>
      val files =
        if (fs.isEmpty) Nil
        else fs.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
      Commit(v.toInt, a, files)
    case other => sys.error(s"EmbeddedCommitLog: unparseable commit '$other'")
  }

  /** Log-dir entries with the given suffix, sorted by name; the
    * directory stream is CLOSED after materializing (a long-lived
    * driver leaks one fd per unclosed Files.list). */
  private def logEntries(table: String, suffix: String): Seq[Path] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) Nil
    else
      Using.resource(Files.list(dir)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(suffix))
          .toSeq.sortBy(_.getFileName.toString)
      }
  }

  def commits(table: String): Seq[Commit] =
    logEntries(table, ".json")
      .map(p => parse(Files.readString(p, StandardCharsets.UTF_8)))

  /** The live file set at `versionAsOf` (inclusive; None = latest):
    * start from the newest checkpoint at-or-below the target and replay
    * only the commits after it — overwrite resets, append accumulates. */
  def filesAt(table: String, versionAsOf: Option[Int]): Seq[String] = {
    val commitPaths = logEntries(table, ".json")
    require(commitPaths.nonEmpty, s"EmbeddedCommitLog: $table has no commits")
    def versionOf(p: Path): Int =
      p.getFileName.toString.takeWhile(_.isDigit).toInt
    val latest = versionOf(commitPaths.last)
    versionAsOf.foreach { v =>
      require(commitPaths.exists(versionOf(_) == v),
        s"EmbeddedCommitLog: $table has no version $v (latest $latest)")
    }
    val target = versionAsOf.getOrElse(latest)
    val base = logEntries(table, ".checkpoint")
      .filter(versionOf(_) <= target).lastOption
      .map(p => parse(Files.readString(p, StandardCharsets.UTF_8)))
    val start = base.fold(Seq.empty[String])(_.files)
    val after = base.fold(-1)(_.version)
    commitPaths
      .filter(p => { val v = versionOf(p); v > after && v <= target })
      .map(p => parse(Files.readString(p, StandardCharsets.UTF_8)))
      .foldLeft(start) { (live, c) =>
        if (c.action == "overwrite") c.files else live ++ c.files
      }
  }

  def read(spark: SparkSession, table: String, versionAsOf: Option[Int]): DataFrame = {
    val files = filesAt(table, versionAsOf)
    require(files.nonEmpty,
      s"EmbeddedCommitLog: $table is empty at version ${versionAsOf.getOrElse("latest")}")
    spark.read.parquet(files.map(f => Paths.get(table, f).toString): _*)
  }

  /** Stage data files, then land the commit ATOMICALLY. An append
    * re-reads the log and retries on a concurrent-writer race; an
    * overwrite ABORTS on one (see the class doc). Returns the committed
    * version. */
  def write(df: DataFrame, table: String, overwrite: Boolean): Int = {
    val tableDir = Paths.get(table)
    Files.createDirectories(logDir(table))
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = tableDir.resolve(s"_staging_$stamp")
    df.write.parquet(staging.toString)
    import scala.jdk.CollectionConverters._
    val parts = Using.resource(Files.list(staging)) {
      _.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    }
    val names = parts.zipWithIndex.map { case (p, i) =>
      val name = s"part-$stamp-$i.parquet"
      Files.move(p, tableDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // clean the now-empty staging dir (best effort — _SUCCESS, .crc)
    Using.resource(Files.walk(staging)) { st =>
      st.iterator().asScala.toSeq.reverse.foreach(p =>
        try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
    def nextVersion(): Int = commits(table).lastOption.fold(0)(_.version + 1)
    var version = nextVersion()
    var done = -1
    while (done < 0) {
      val tmp = logDir(table).resolve(s".tmp_$stamp")
      Files.writeString(tmp,
        render(Commit(version, if (overwrite) "overwrite" else "append", names)),
        StandardCharsets.UTF_8)
      // test seam: a spec can inject a concurrent commit exactly in the
      // race window (between version selection and the atomic link) —
      // fires once, then self-resets
      val inject = raceInjection
      raceInjection = () => ()
      inject()
      try {
        // createLink is the POSIX create-new atomic primitive (a plain
        // ATOMIC_MOVE is rename(2), which silently REPLACES an existing
        // target): either this writer owns the version or the link
        // fails and the optimistic-concurrency loop handles the race
        Files.createLink(logDir(table).resolve(f"$version%08d.json"), tmp)
        Files.deleteIfExists(tmp)
        done = version
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          if (overwrite)
            throw new java.util.ConcurrentModificationException(
              s"EmbeddedCommitLog: overwrite of $table lost the race for " +
                s"version $version to a concurrent commit it has not " +
                "observed — landing it would silently drop that commit " +
                "(real Delta aborts conflicting overwrites the same way); " +
                "re-derive the overwrite from the current snapshot and retry")
          else
            version = math.max(version + 1, nextVersion()) // re-read, not just +1
      }
    }
    maybeCheckpoint(table, done)
    done
  }

  /** Roll a checkpoint after every [[checkpointInterval]]-th commit. The
    * live set at a version is a pure function of the log, so a lost
    * checkpoint race is harmless (identical content) and swallowed. */
  private def maybeCheckpoint(table: String, version: Int): Unit =
    if ((version + 1) % checkpointInterval == 0) {
      val live = filesAt(table, Some(version))
      val tmp = logDir(table).resolve(s".ckpt_tmp_$version")
      Files.writeString(tmp, render(Commit(version, "checkpoint", live)),
        StandardCharsets.UTF_8)
      try Files.createLink(logDir(table).resolve(f"$version%08d.checkpoint"), tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
    }
}
