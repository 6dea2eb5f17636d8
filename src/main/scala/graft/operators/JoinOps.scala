package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks natively.
  *
  * As-of join: for each left row, the latest right row with
  * rightTime ≤ leftTime (+ optional tolerance) within the same key.
  *
  * Implemented with the union + window trick: tag both sides, union on a
  * shared schema, sort within key partitions by time, carry the last seen
  * right row forward with `last(..., ignoreNulls)`, then keep left rows.
  * One shuffle on the key (same as any keyed join), NO range cross-product
  * and no per-row scans — this is the shape that survives 100 TB, unlike a
  * join on an inequality predicate (O(n·m) within key).
  *
  * Skew boundary (stated, not hidden): a window has no AQE skew-split, so
  * ONE key holding a large fraction of both sides serializes through one
  * reducer's sort. That is inherent to as-of semantics (the key's merged
  * timeline must be ordered somewhere); if a hot key dominates, pre-split
  * it by coarse time range (as-of within each range + a boundary
  * carry-in row per range) before calling this.
  */
object JoinOps {

  /** Backward as-of join.
    *
    * @param left      left table
    * @param right     right table
    * @param keyCols   equi-join keys present in both
    * @param leftTime  event-time column name in left
    * @param rightTime event-time column name in right
    * @param rightCols right columns to carry (renamed as given)
    * Output: all left columns + for each (c → alias) in rightCols the as-of
    * value of right.c as `alias` (null when no prior right row).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String]
  ): DataFrame = asofJoin(left, right, keyCols, leftTime, rightTime, rightCols, forward = false, tolerance = None)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * rightTime ≥ leftTime within the same key (DuckDB `ASOF JOIN ...
    * ON t >= ...` mirrored; same union+window shape run on the reversed
    * time order). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String]
  ): DataFrame = asofJoin(left, right, keyCols, leftTime, rightTime, rightCols, forward = true, tolerance = None)

  /** As-of join with direction and an optional tolerance: matches whose
    * |leftTime − rightTime| exceeds `tolerance` are nulled out (pandas
    * merge_asof semantics). Times must be directly comparable; tolerance
    * applies to their difference cast to long — seconds for timestamp
    * columns, native units for numerics (feed unix_micros columns for µs
    * tolerances).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String],
      forward: Boolean,
      tolerance: Option[Long]
  ): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val leftCols = left.columns.toSeq
    val carried = rightCols.toSeq.sortBy(_._2)

    // All carried right columns travel as ONE nullable struct (plus an
    // always-true presence flag) so a single last(ignoreNulls) fill is
    // row-atomic: a right row whose carried values are genuinely NULL is
    // still "the latest row ≤ t" (the flag keeps its struct non-null), and
    // multiple carried columns can never mix values from different rows.
    val rStructType = StructType(
      StructField("__present", BooleanType, nullable = false) +:
        StructField("__rt", right.schema(rightTime).dataType, nullable = true) +:
        carried.map { case (c, alias) => right.schema(c).copy(name = alias) })

    // shared schema: keys, __t, __is_left, left payload (nulls on right rows), carried struct
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(rStructType).as("__r"): _*
    )
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(
          lit(true).as("__present") +:
            col(rightTime).as("__rt") +:
            carried.map { case (c, alias) => col(c).as(alias) }: _*).as("__r"): _*
    )
    val unioned = lTagged.unionByName(rTagged)

    // Right rows sort before left rows at the same timestamp (asof is
    // inclusive on both directions); forward = the same fill run over the
    // reversed time order. The carried struct itself is the final sort
    // key: without it, several right rows at the SAME (key, time) would
    // be filled in partition-dependent order and the result would be
    // nondeterministic across runs — with it, the greatest carried tuple
    // wins, deterministically. (Carried columns must be orderable; maps
    // are not.)
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__is_left").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // tolerance (pandas merge_asof-style): a matched row further than
    // `tolerance` from the left time yields nulls, exactly like no match.
    // Units are the time columns' long cast (seconds for timestamps —
    // feed unix_micros columns for µs tolerances).
    import org.apache.spark.sql.types.TimestampNTZType
    val withinTol = tolerance match {
      case Some(t) =>
        val diff = (left.schema(leftTime).dataType, right.schema(rightTime).dataType) match {
          case (TimestampNTZType, TimestampNTZType) =>
            // NTZ−NTZ is a pure wall-clock difference computed directly —
            // never routed through an epoch conversion, so the distance
            // cannot depend on spark.sql.session.timeZone or shrink/grow
            // across a DST transition
            expr("timestampdiff(SECOND, __r.__rt, __t)")
          case (TimestampNTZType, _) | (_, TimestampNTZType) =>
            throw new IllegalArgumentException(
              "asofJoin tolerance: left/right time columns mix TIMESTAMP_NTZ with " +
                "another type — align the flavors before joining (a mixed distance " +
                "has no timezone-independent meaning)")
          case _ =>
            col("__t").cast("long") - col("__r.__rt").cast("long")
        }
        abs(diff) <= t
      case None => lit(true)
    }

    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col("__t").as(leftTime)) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == leftTime).map(c => col(s"__l_$c").as(c)) ++
          carried.map { case (c, alias) =>
            when(withinTol, col(s"__r.$alias")).otherwise(lit(null).cast(right.schema(c).dataType)).as(alias)
          }: _*
      )
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): for each
    * left row, whichever of the backward (latest ≤ t) and forward
    * (earliest ≥ t) candidates is closer in time; ties prefer the
    * backward row. Composed as the two directional passes — each the
    * union+window shape, so still two keyed shuffles and zero range
    * cross-products — with a per-row distance pick. `tolerance` bounds
    * both directions (seconds for timestamps, native units for numerics,
    * same contract as [[asofJoin]]).
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(!left.columns.exists(c => c.startsWith("__b_") || c.startsWith("__f_")),
      "asofNearest reserves the __b_/__f_ column prefixes")
    // the matched right TIME must ride along for the distance pick; when
    // the caller already carries rightTime its alias is reused (a Map
    // can't carry one source column under two aliases)
    val bMap = rightCols.map { case (c, a) => (c, s"__b_$a") }
    val fMap = rightCols.map { case (c, a) => (c, s"__f_$a") }
    val bRt = bMap.getOrElse(rightTime, "__b___rt_near")
    val fRt = fMap.getOrElse(rightTime, "__f___rt_near")
    val bCols = bMap + (rightTime -> bRt)
    val fCols = fMap + (rightTime -> fRt)
    val back = asofJoin(left, right, keyCols, leftTime, rightTime, bCols, forward = false, tolerance)
    val both = asofJoin(back, right, keyCols, leftTime, rightTime, fCols, forward = true, tolerance)

    import org.apache.spark.sql.types.TimestampNTZType
    val anyNtz = left.schema(leftTime).dataType == TimestampNTZType ||
      right.schema(rightTime).dataType == TimestampNTZType
    val ntz = left.schema(leftTime).dataType == TimestampNTZType &&
      right.schema(rightTime).dataType == TimestampNTZType
    require(ntz || !anyNtz,
      "asofNearest: mixed TIMESTAMP_NTZ/instant time columns — align the flavors first")
    def dist(rt: String): Column =
      if (ntz) abs(expr(s"timestampdiff(SECOND, `$rt`, `$leftTime`)"))
      else abs(col(leftTime).cast("long") - col(rt).cast("long"))
    val bd = dist(bRt)
    val fd = dist(fRt)
    // null distance = no candidate in that direction (or beyond tolerance)
    val useBack = fd.isNull || (bd.isNotNull && bd <= fd)
    val picked = rightCols.toSeq.sortBy(_._2).map { case (_, a) =>
      when(useBack, col(s"__b_$a")).otherwise(col(s"__f_$a")).as(a)
    }
    val keep = both.columns.filterNot(c => c.startsWith("__b_") || c.startsWith("__f_"))
    both.select(keep.map(col).toIndexedSeq ++ picked: _*)
  }

  /** Range join: left rows matched to right rows with
    * right.start ≤ left.point < right.end, bucketized so the join is an
    * equi-join on (key, bucket) instead of a pure inequality join.
    * `bucketWidth` must be ≥ the max interval width for full correctness
    * (wider intervals span multiple buckets via explode).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    // integer division (`div`), NOT double division: at epoch-µs
    // magnitudes (~1e15) a double quotient can round across the bucket
    // edge and silently drop a boundary match. The __graft_ prefix also
    // tells the RangeJoinBucketing optimizer rule this join is already
    // bucketized (its guard skips conditions referencing __graft_*).
    val lb = left.withColumn("__graft_lbucket", expr(s"CAST($pointCol AS BIGINT) div $bucketWidth"))
    // right-side key columns are RENAMED before the join: when both
    // frames descend from one scan (events enriched against intervals
    // built from the same events), lb(c) === rb(c) resolves to the SAME
    // attribute — the trivially-true-predicate hazard the
    // streamStreamJoin round-10 fix closed; distinct names make the
    // equi-join unambiguous by construction. Renamed keys are dropped
    // from the output (the left side's survive).
    val rb0 = right.withColumn(
      "__graft_rbucket",
      explode(sequence(
        expr(s"CAST($startCol AS BIGINT) div $bucketWidth"),
        expr(s"CAST($endCol AS BIGINT) div $bucketWidth")))
    )
    val rb = keyCols.foldLeft(rb0)((df, c) => df.withColumnRenamed(c, s"__graft_rk_$c"))
    val keyCond = keyCols.map(c => lb(c) === rb(s"__graft_rk_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    keyCols.foldLeft(
      lb.join(rb, keyCond && lb("__graft_lbucket") === rb("__graft_rbucket") &&
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
        .drop("__graft_lbucket", "__graft_rbucket"))(
      (df, c) => df.drop(s"__graft_rk_$c"))
  }

  /** Interval×interval overlap join — [lS,lE) vs [rS,rE) half-open — with
    * the same bucketization discipline as [[rangeJoin]], so the cross
    * product never forms: each side explodes to the fixed-width buckets
    * its span covers and pairs equi-join on the bucket id.
    *
    * The usual bucketized-interval problem is that a pair overlapping
    * across b shared buckets matches b times and needs a DISTINCT pass
    * over the (potentially huge) pair set. Here every overlapping pair is
    * emitted EXACTLY ONCE by construction: the join keeps a pair only in
    * the bucket that contains the overlap's START, `greatest(lS, rS) div
    * width` — a bucket both sides provably cover — so no dedup shuffle
    * exists at all.
    *
    * Column names must be disjoint across the two frames (same contract
    * as rangeJoin). 100 TB: one shuffle per side on (keys, bucket); a
    * span covering b buckets replicates b× — pick `bucketWidth` near the
    * typical span length to keep b small.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStartCol: String,
      leftEndCol: String,
      rightStartCol: String,
      rightEndCol: String,
      bucketWidth: Long
  ): DataFrame = {
    val lb = left.withColumn(
      "__graft_lbucket",
      explode(sequence(
        expr(s"CAST($leftStartCol AS BIGINT) div $bucketWidth"),
        expr(s"CAST($leftEndCol AS BIGINT) div $bucketWidth"))))
    val rb = right.withColumn(
      "__graft_rbucket",
      explode(sequence(
        expr(s"CAST($rightStartCol AS BIGINT) div $bucketWidth"),
        expr(s"CAST($rightEndCol AS BIGINT) div $bucketWidth"))))
    val keyCond = keyCols.map(c => lb(c) === rb(c)).reduceOption(_ && _).getOrElse(lit(true))
    val overlaps = col(leftStartCol) < col(rightEndCol) && col(rightStartCol) < col(leftEndCol)
    // emit-once anchor: only the bucket holding max(lS, rS)
    val anchor = lb("__graft_lbucket") ===
      expr(s"greatest(CAST($leftStartCol AS BIGINT), CAST($rightStartCol AS BIGINT)) div $bucketWidth")
    lb.join(rb, keyCond && lb("__graft_lbucket") === rb("__graft_rbucket") && overlaps && anchor)
      .drop("__graft_lbucket", "__graft_rbucket")
  }
}
