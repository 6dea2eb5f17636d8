package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Round-13 verdict item 1: the WindowKeyAudit standing-gate posture
  * applied to `broadcast()` inputs.
  *
  * The hazard: an EXPLICIT `broadcast(df)` hint is the author asserting
  * "this frame fits on every executor AND the driver". Spark's own
  * auto-broadcast is size-guarded (autoBroadcastJoinThreshold measures
  * the actual bytes at plan time); an explicit hint is NOT — it
  * broadcasts whatever the frame turns out to be. A hint whose input is
  * DATA-SIZED (a raw scan, or a frame whose row count is proportional
  * to a fact table) is fine at sf0.1 and an OOM at 100×. Round 13's
  * `q41_hotkey_join` was exactly this: `broadcast(keys with count>4)`
  * selects ~half of TPC-H orders — a fact-proportional key set behind a
  * threshold that LOOKS selective.
  *
  * Classification of the hinted side's plan, most severe wins:
  *  - [[Bounded]]: a LIMIT / WindowGroupLimit (top-k) anywhere cutting
  *    the frontier; a LocalRelation (driver-built constants, train/apply
  *    splits); OneRowRelation; a small Range; a GLOBAL aggregate (1
  *    row); a left-SEMI join against a Bounded key set (a k-key slice —
  *    output ≤ k × per-key multiplicity; the multiplicity is the
  *    documented residual caveat, same as high-card window partitions);
  *    a scan of a fixed-domain table (region=5, nation=25 rows at every
  *    SF).
  *  - [[DomainSized]]: an aggregate grouped only by
  *    domain/calendar/band/low-card columns — its output is the domain
  *    grid, fixed however big the corpus.
  *  - [[DataSized]]: the frontier reaches a raw fact/dim scan or a
  *    data-keyed frame with nothing bounding it. A FINDING unless the
  *    query is in [[justified]].
  *
  * Size-monotone operators (Filter / Project / data-keyed Aggregate /
  * Deduplicate / Sort / Window) pass the classification through: their
  * output is ≤ their input's rows. Inner/outer joins take the worst of
  * both sides (optimistic for many-many equi joins — documented caveat;
  * every flagged class this audit exists for is a straight raw-scan or
  * threshold-filter input, which this classifies exactly).
  *
  * X-ray contract: run with `spark.graft.ckpt.disabled=true` (lazy
  * checkpoints would truncate the hinted subtree) — auditAll sets it.
  * Explicit hints survive into the OPTIMIZED plan as `Join.hint`
  * (EliminateResolvedHint moves the ResolvedHint node into the join),
  * so the audit reads `JoinHint.{leftHint,rightHint}.strategy ==
  * BROADCAST` and classifies the corresponding side.
  */
object BroadcastSizeAudit {

  import WindowKeyAudit.{domainNames, lowCardNames}

  /** Tables whose row count is FIXED by the schema's value domain, not
    * the scale factor: TPC-H region (5) and nation (25). */
  private val fixedDomainTables = Set("region", "nation")

  /** Queries allowed to keep a data-sized broadcast, with the §5.1-style
    * rationale. Keep SHORT — every entry is a debt. */
  val justified: Map[String, String] = Map(
    "q55_join_hints" ->
      ("SQL-surface CONFORMANCE query pinning the hint FAMILY itself " +
        "(broadcast/shuffle_hash/merge side-by-side on the same join) — " +
        "the broadcast leg must carry an explicit hint to be the thing " +
        "under test; the scale-safe form of the query is q3/q5's " +
        "hint-free shape"))

  sealed trait C { def sev: Int }
  case object Bounded extends C { val sev = 0 }
  case object DomainSized extends C { val sev = 1 }
  case object DataSized extends C { val sev = 2 }
  private def worst(cs: Seq[C]): C = if (cs.isEmpty) Bounded else cs.maxBy(_.sev)

  /** A filter conjunct that pins a per-entity KEY column to ≤ k values
    * (`vec_id < 8`, `doc_id = lit`, `id IN (…)`) bounds the output to
    * k × per-key multiplicity — the query-set / k-key-slice shape. The
    * multiplicity is the same documented residual caveat as high-card
    * window partitions. */
  private def smallNum(l: Any): Boolean = l match {
    case i: Int  => i >= 0 && i <= 4096
    case i: Long => i >= 0 && i <= 4096
    case _       => false
  }
  private def keyAttr(e: Expression): Boolean = e match {
    case a: Attribute => WindowKeyAudit.highCardNames.contains(a.name)
    case c: Cast      => keyAttr(c.child)
    case _            => false
  }
  private def keyBoundConjunct(e: Expression): Boolean = e match {
    case And(l, r) => keyBoundConjunct(l) || keyBoundConjunct(r)
    case LessThan(a, Literal(v, _)) if keyAttr(a)            => smallNum(v)
    case LessThanOrEqual(a, Literal(v, _)) if keyAttr(a)     => smallNum(v)
    case GreaterThan(Literal(v, _), a) if keyAttr(a)         => smallNum(v)
    case GreaterThanOrEqual(Literal(v, _), a) if keyAttr(a)  => smallNum(v)
    case EqualTo(a, _: Literal) if keyAttr(a)                => true
    case EqualTo(_: Literal, a) if keyAttr(a)                => true
    case In(a, vs) if keyAttr(a) && vs.size <= 4096          => vs.forall(_.isInstanceOf[Literal])
    case i: InSet if keyAttr(i.child) && i.hset.size <= 4096 => true
    case _ => false
  }

  private def fixedDomainName(n: String): Boolean =
    domainNames.contains(n) || lowCardNames.contains(n)

  /** Is `a` the ORDINAL output of a posexplode generator under `p`? A
    * position index is bounded by the max array length — value-domain,
    * not row-count-domain — whatever the attribute is named. */
  private def posexplodeOrdinal(p: LogicalPlan, a: Attribute): Boolean =
    p.exists {
      case g: Generate =>
        g.generator.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PosExplode] &&
          g.generatorOutput.headOption.exists(_.exprId == a.exprId)
      case _ => false
    }

  /** Expressions whose VALUE DOMAIN is fixed regardless of row count:
    * an md5 hex prefix of ≤ 4 chars (≤ 16⁴ values — the deterministic
    * bucketing convention), a value band `floor(x / L)` / `x div L`
    * (bounded by the column's value range over L — the §5.1 banding
    * contract), a modulo by a literal. */
  private def isDomainExpr(e: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Substring(inner, Literal(1, _), Literal(n: Int, _))
        if n <= 4 && inner.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Md5]) => true
    case org.apache.spark.sql.catalyst.expressions.Floor(
        org.apache.spark.sql.catalyst.expressions.Divide(_, _: Literal, _)) => true
    case org.apache.spark.sql.catalyst.expressions.IntegralDivide(_, _: Literal, _) => true
    // a literal-divide in GROUPING position is a banding step (its
    // integral cast/floor/clamp wrapper is what reaches this matcher)
    case org.apache.spark.sql.catalyst.expressions.Divide(_, _: Literal, _) => true
    case org.apache.spark.sql.catalyst.expressions.Pmod(_, l: Literal, _) => smallDomainLit(l.value)
    case org.apache.spark.sql.catalyst.expressions.Remainder(_, l: Literal, _) => smallDomainLit(l.value)
    // a clamp (least/greatest) of banded/literal pieces stays banded
    case l: org.apache.spark.sql.catalyst.expressions.Least =>
      l.children.forall(c => c.isInstanceOf[Literal] || isDomainExpr(c))
    case g: org.apache.spark.sql.catalyst.expressions.Greatest =>
      g.children.forall(c => c.isInstanceOf[Literal] || isDomainExpr(c))
    case c: Cast => isDomainExpr(c.child)
    case a: org.apache.spark.sql.catalyst.expressions.Alias => isDomainExpr(a.child)
    case _ => false
  }
  private def smallDomainLit(v: Any): Boolean = v match {
    case i: Int  => i > 0 && i <= 65536
    case i: Long => i > 0 && i <= 65536
    case _       => false
  }

  /** Is this grouping ref fixed-domain? True if its name is a known
    * fixed-domain name AT ANY LINK of its rename chain (`event_type AS
    * g` and `cast(id as int) AS perm` both qualify — the first by the
    * root, the second by the alias), or its defining expression is a
    * band/bucket/modulo [[isDomainExpr]]. */
  private def refFixedDomain(p: LogicalPlan, a: Attribute, depth: Int = 0): Boolean = {
    if (fixedDomainName(a.name)) true
    else if (posexplodeOrdinal(p, a)) true // array position: value-domain
    else if (depth > 8) false
    else {
      val defd = p.collectFirst {
        case proj: Project if proj.projectList.exists {
          case al: org.apache.spark.sql.catalyst.expressions.Alias => al.exprId == a.exprId
          case _ => false
        } =>
          proj.projectList.collectFirst {
            case al: org.apache.spark.sql.catalyst.expressions.Alias if al.exprId == a.exprId => al.child
          }.get
      }
      def simple(e: Expression): Option[Attribute] = e match {
        case at: Attribute => Some(at)
        case c: Cast       => simple(c.child)
        case _             => None
      }
      defd match {
        case Some(e) if isDomainExpr(e) => true
        case Some(e) => simple(e).exists(root => refFixedDomain(p, root, depth + 1))
        case None    => false
      }
    }
  }

  /** Size class of `p`'s output row count. */
  def classify(p: LogicalPlan): C = p match {
    case f: Filter if keyBoundConjunct(f.condition) => Bounded
    case a: Aggregate =>
      if (a.groupingExpressions.isEmpty) Bounded // global agg = 1 row
      else {
        val fixedDomain = a.groupingExpressions.forall { ge =>
          isDomainExpr(ge) || ge.references.forall(r => refFixedDomain(a.child, r))
        }
        if (fixedDomain) DomainSized
        else classify(a.child) // data-keyed agg: output ≤ input rows
      }
    case d: Deduplicate =>
      if (d.keys.distinct.forall(r => refFixedDomain(d.child, r)))
        DomainSized
      else classify(d.child)
    case _: GlobalLimit | _: LocalLimit | _: WindowGroupLimit => Bounded
    case _: LocalRelation | _: OneRowRelation => Bounded
    case r: Range => if (r.numElements <= BigInt(1L << 22)) Bounded else DataSized
    case j: Join =>
      j.joinType match {
        case LeftSemi =>
          // a semi join against a bounded key set is a k-key slice
          if (classify(j.right) == Bounded) Bounded
          else classify(j.left) // semi output ≤ left
        case LeftAnti => classify(j.left) // anti output ≤ left
        case org.apache.spark.sql.catalyst.plans.Inner if j.condition.nonEmpty &&
            (classify(j.left) == Bounded || classify(j.right) == Bounded) =>
          // a CONDITIONED inner join with a bounded side is a k-key
          // slice (≤ k × per-key multiplicity — same documented caveat
          // as LeftSemi); a condition-less cross join is the product
          // and falls through to worst-of-sides
          Bounded
        case _ => worst(Seq(classify(j.left), classify(j.right)))
      }
    case l: LogicalRelation =>
      val paths = l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _                   => Nil
      }
      if (paths.nonEmpty && paths.forall(p =>
          fixedDomainTables.exists(t => p.contains(t + ".parquet") || p.endsWith(t))))
        Bounded
      else DataSized
    case _: LeafNode => DataSized
    case other => worst(other.children.map(classify))
  }

  /** Violations in one query's OPTIMIZED plan: every explicit broadcast
    * hint whose hinted side classifies DataSized. */
  def findings(name: String, plan: LogicalPlan): Seq[String] = {
    def hinted(h: Option[HintInfo]): Boolean =
      h.exists(_.strategy.contains(BROADCAST))
    val sides = plan.collect {
      case j: Join if hinted(j.hint.leftHint)  => Seq(("left", j.left)) ++
        (if (hinted(j.hint.rightHint)) Seq(("right", j.right)) else Nil)
      case j: Join if hinted(j.hint.rightHint) => Seq(("right", j.right))
      // a hint not yet folded into a join (e.g. unoptimized plan in specs)
      case r: ResolvedHint if r.hints.strategy.contains(BROADCAST) =>
        Seq(("hint", r.child))
    }.flatten
    sides.flatMap { case (side, p) =>
      if (classify(p) == DataSized && !justified.contains(name))
        Seq(s"$name: broadcast() of a DATA-SIZED frame ($side side of a join: " +
          s"${p.nodeName} frontier) — an explicit hint is an unguarded " +
          "executor+driver memory bet; derive the broadcast input as a " +
          "bounded top-k / domain aggregate / fixed-domain slice, or " +
          "justify in BroadcastSizeAudit.justified")
      else Nil
    }
  }

  /** Audit every SparkEntry query (final plan + every eagerly
    * checkpointed subtree recorded through the Ckpt seam). */
  def auditAll(spark: SparkSession, sfDir: String): Seq[String] = {
    spark.conf.set("spark.graft.ckpt.disabled", "true")
    spark.conf.set("spark.graft.ckpt.record", "true")
    // RankOps.maybeBroadcast's banded-offset hints are SIZE-CERTIFIED at
    // call time (bandCountHint vs broadcastMaxBands, kill-switch = 0,
    // plain shuffle join stays correct without the hint) — this audit
    // covers UNGUARDED hints, so run the plans with the gate off.
    spark.conf.set("spark.graft.bandedRank.broadcastMaxBands", "0")
    try {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
        try {
          graft.operators.Ckpt.drainRecorded()
          val top = findings(n, fn(spark, sfDir).queryExecution.optimizedPlan)
          val sub = graft.operators.Ckpt.drainRecorded().flatMap(p =>
            findings(s"$n [ckpt subtree]", p))
          top ++ sub
        } catch {
          case e: Throwable =>
            Seq(s"$n: audit could not build/optimize — ${e.getClass.getSimpleName} " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
      }
    } finally {
      spark.conf.set("spark.graft.ckpt.disabled", "false")
      spark.conf.set("spark.graft.ckpt.record", "false")
      spark.conf.unset("spark.graft.bandedRank.broadcastMaxBands")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = auditAll(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    out.foreach(f => println(s"[broadcast-audit] $f"))
    println(s"[broadcast-audit] ${out.size} findings")
    spark.stop()
    if (out.nonEmpty) sys.exit(1)
  }
}
