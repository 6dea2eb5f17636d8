package graft

import graft.plans.WindowKeyAudit

/** SURVEY §5.1's window key-cardinality audit as a standing gate
  * (round-12 verdict item 4): every `SparkEntry.queries` plan is walked
  * with lazy checkpoints DISABLED (Ckpt.lazyCkpt's kill-switch — the
  * round-12 `events_dgim` hot window hid behind exactly such a
  * checkpoint), and any Window partitioned only by known low-card
  * columns over a data-sized input fails here, pre-commit, instead of
  * surfacing as a 100 TB straggler in a verdict. First run caught
  * `data_token_budget`'s raw per-lang cumulative window — a site the
  * hand-maintained §5.1 table had missed since round 9. */
class WindowKeyAuditSpec extends SparkSpec {

  test("no query plans a low-card RAW window (§5.1 hot-partition class)") {
    val out = WindowKeyAudit.auditAll(spark, "/root/testdata/sf0.001")
    assert(out.isEmpty, s"${out.size} low-card RAW windows:\n${out.mkString("\n")}")
  }

  test("every justified exception names a real query") {
    val unknown = WindowKeyAudit.justified.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"justified entries without a query: $unknown")
  }

  test("the low-card / high-card name sets stay disjoint") {
    val overlap = WindowKeyAudit.lowCardNames intersect WindowKeyAudit.highCardNames
    assert(overlap.isEmpty, s"a column cannot be both: $overlap")
  }
}
