package graft.operators

import org.apache.spark.sql.Dataset

/** The repo's lazy-localCheckpoint convention behind a kill-switch.
  *
  * Multi-consumer frames ride `.transform(Ckpt.lazyCkpt)` instead of a
  * bare `.localCheckpoint(eager = false)` so that
  * `spark.graft.ckpt.disabled=true` (set ONLY by plan-audit specs —
  * WindowKeyAuditSpec) makes the checkpoint a no-op and the full
  * logical plan visible. A lazy checkpoint otherwise truncates the plan
  * to a LogicalRDD at construction, which is exactly how the round-12
  * `events_dgim` hot-partition window HID from every plan pin: the
  * rows-sized per-key sort lived inside the checkpointed subtree and no
  * audit walking the final query plan could see it.
  *
  * Value-safety of the switch: every checkpointed frame in this repo is
  * deterministic (md5-seeded, no rand), so recomputing it per consumer
  * changes cost, never values. Eager pins that carry CORRECTNESS
  * contracts (the writeBucketed staged-swap deadlock contract pins the
  * old generation with an EAGER `.localCheckpoint()`) do not route
  * through this helper and are never disabled.
  */
object Ckpt {
  def lazyCkpt[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.conf.getOption("spark.graft.ckpt.disabled").contains("true")) ds
    else ds.localCheckpoint(eager = false)
}
