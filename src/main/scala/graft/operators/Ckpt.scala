package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The repo's localCheckpoint conventions behind audit seams.
  *
  * LAZY checkpoints (multi-consumer frames) ride `.transform(Ckpt
  * .lazyCkpt)` instead of a bare `.localCheckpoint(eager = false)` so
  * that `spark.graft.ckpt.disabled=true` (set ONLY by plan-audit
  * harnesses — WindowKeyAudit/BroadcastSizeAudit/ArrayAggAudit) makes
  * the checkpoint a no-op and the full logical plan visible. A lazy
  * checkpoint otherwise truncates the plan to a LogicalRDD at
  * construction, which is exactly how the round-12 `events_dgim`
  * hot-partition window HID from every plan pin: the rows-sized per-key
  * sort lived inside the checkpointed subtree and no audit walking the
  * final query plan could see it.
  *
  * Value-safety of the switch: every lazily checkpointed frame in this
  * repo is deterministic (md5-seeded, no rand), so recomputing it per
  * consumer changes cost, never values.
  *
  * EAGER checkpoints (iterative-loop lineage cuts, staged-swap replay
  * pins) ride `.transform(Ckpt.eagerCkpt)`. These carry CORRECTNESS
  * contracts (a loop that re-derives its edge set per round is a
  * different computation; the writeBucketed staged-swap pins the old
  * generation before an overwrite) so the kill-switch NEVER disables
  * them — instead, when `spark.graft.ckpt.record=true`, the
  * pre-checkpoint OPTIMIZED plan is recorded into [[drainRecorded]]'s
  * registry so the plan audits can walk the subtree the checkpoint is
  * about to hide. This closes WindowKeyAudit's round-13 documented
  * blind spot (eagerly checkpointed subtrees were planned before the
  * audit saw them).
  */
object Ckpt {
  def lazyCkpt[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.conf.getOption("spark.graft.ckpt.disabled").contains("true")) ds
    else ds.localCheckpoint(eager = false)

  private val recorded = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]

  /** Eager lineage-cut pin; always checkpoints (correctness contract),
    * but exposes the pre-checkpoint plan to the audits when recording. */
  def eagerCkpt[T](ds: Dataset[T]): Dataset[T] = {
    if (ds.sparkSession.conf.getOption("spark.graft.ckpt.record").contains("true"))
      recorded.synchronized { recorded += ds.queryExecution.optimizedPlan }
    ds.localCheckpoint()
  }

  /** Plans recorded by [[eagerCkpt]] since the last drain (audit use). */
  def drainRecorded(): Seq[LogicalPlan] =
    recorded.synchronized { val out = recorded.toList; recorded.clear(); out }

  private val meterId = new java.util.concurrent.atomic.AtomicLong(0)

  /** [[eagerCkpt]] that additionally evaluates aggregate `metrics` DURING
    * the materialization job via `Dataset.observe` (guide §1.2: an
    * iterative loop's convergence scan is free when it rides the
    * checkpoint write instead of running as a second job over the blocks
    * just written — one full pass over the loop state per round, gone).
    * Returns the pinned frame plus the observed metrics row. Metrics
    * must be aggregates that never need a post-scan (count/sum/min/max).
    */
  def eagerCkptMetered[T](ds: Dataset[T], metrics: org.apache.spark.sql.Column*): (Dataset[T], org.apache.spark.sql.Row) = {
    val name = s"__graft_ckpt_meter_${meterId.incrementAndGet()}"
    val obs = ds.observe(name, metrics.head, metrics.tail: _*)
    if (ds.sparkSession.conf.getOption("spark.graft.ckpt.record").contains("true"))
      recorded.synchronized { recorded += obs.queryExecution.optimizedPlan }
    val pinned = obs.localCheckpoint()
    (pinned, obs.queryExecution.observedMetrics(name))
  }
}
