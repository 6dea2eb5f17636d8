package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * JASA): score blocked candidate pairs by summing per-field log-odds
  * agreement weights — w_agree = log2(m/u), w_disagree =
  * log2((1−m)/(1−u)) for field match probabilities m (among true
  * matches) and u (among non-matches) — then band the total into
  * match / possible / non-match decisions.
  *
  * Engine-portability discipline: weights are INTEGER BASIS POINTS
  * (log-odds × 100) and comparators are integer predicates
  * (levenshtein bounds, equality, cents tolerance), so the score is an
  * exact integer sum — no floating-point anywhere in the decision, and
  * a SQL oracle replays it bit-for-bit.
  *
  * Scale posture: candidates come from an equi-join on a caller-chosen
  * BLOCKING key (never all-pairs); with bounded blocks the pair count
  * is rows × block-width, one shuffle on the key (AQE broadcasts a
  * small probe side). The comparator work is map-side codegen'd
  * integer expressions on the joined rows. This is the ER-standard
  * shape: blocking bounds the quadratic, FS weights rank within it.
  */
object LinkageOps {

  /** One field comparison: `agree` is an integer predicate over the
    * joined candidate frame; weights in log-odds basis points. */
  case class FieldRule(name: String, agree: Column, wAgreeBp: Long, wDisagreeBp: Long)

  /** Score candidate pairs of `a` × `b` sharing `blockCol`. Emits one
    * row per candidate pair: both id cols, per-field `agree_<name>`
    * booleans, integer `score_bp`, and `decision`
    * ('match' ≥ `matchBp`, 'possible' ≥ `possibleBp`, else 'nonmatch').
    */
  def fellegiSunter(
      a: DataFrame,
      b: DataFrame,
      blockCol: String,
      rules: DataFrame => Seq[FieldRule],
      matchBp: Long,
      possibleBp: Long
  ): DataFrame = {
    require(matchBp > possibleBp, "fellegiSunter: match band must sit above possible band")
    val cand = a.join(b, blockCol)
    val rs = rules(cand)
    require(rs.nonEmpty, "fellegiSunter: at least one field rule")
    val flagged = rs.foldLeft(cand) { (df, r) =>
      df.withColumn(s"agree_${r.name}", r.agree)
    }
    // the score reads the FLAG columns, not the agree expressions — a
    // comparator like levenshtein would otherwise be evaluated twice
    // per pair (once in the score's CASE, once as the flag; Catalyst
    // does not CSE across the two sites — measured 2× comparator CPU
    // on the round-10 entity-resolution double-pass)
    val score = rs.map(r =>
        when(col(s"agree_${r.name}"), lit(r.wAgreeBp)).otherwise(lit(r.wDisagreeBp)))
      .reduce(_ + _)
    flagged
      .withColumn("score_bp", score)
      .withColumn("decision",
        when(col("score_bp") >= matchBp, lit("match"))
          .when(col("score_bp") >= possibleBp, lit("possible"))
          .otherwise(lit("nonmatch")))
  }
}
