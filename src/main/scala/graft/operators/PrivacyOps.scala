package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release (Dwork et al. 2006): noisy
  * counts and clipped sums under the Laplace mechanism, with the noise
  * drawn DETERMINISTICALLY from a seeded md5-uniform — the same
  * retry-stable, engine-portable randomness discipline as the sampling
  * family ([[SplitOps]]): a re-run of the release (or a DuckDB replay of
  * the formula) reproduces the published table bit-for-bit, and no RNG
  * state rides in the job.
  *
  * DP hygiene encoded here, not left to the caller:
  *   - per-row CONTRIBUTION CLIPPING to ±`clip` before the sum (without
  *     a bound, sum sensitivity is unbounded and ε is meaningless);
  *   - sensitivity → scale: count Δ=1 → b=1/ε_count; clipped sum
  *     Δ=clip → b=clip/ε_sum;
  *   - an explicit ε LEDGER in the output (per-metric ε plus the
  *     release's composed total, sequential composition) so downstream
  *     budget accounting is data, not tribal knowledge;
  *   - the released table carries ONLY noisy values — true aggregates
  *     never leave the operator.
  *
  * Noise: inverse-CDF Laplace, noise = −b·sign(u−½)·ln(1−2|u−½|) with
  * u = (first-8-hex-of-md5(release:metric:group) + ½)/2³², u ∈ (0,1)
  * and never exactly ½ (the +½ offset sits between integers), rounded
  * to 6 decimals so both engines publish the identical double.
  *
  * Scale posture: one partial-agg groupBy (map-side combine) over the
  * clipped projection; noise and ledger are per-GROUP map expressions on
  * the group-domain-sized result — nothing beyond the base aggregate
  * shuffles, no RNG coordination across executors.
  */
object PrivacyOps {

  /** Seeded uniform in (0,1): (md5-high-32 + ½)/2³² — engine-portable
    * (DuckDB: (CAST('0x'||substr(md5(s),1,8) AS BIGINT)+0.5)/4294967296). */
  private def seededUniform(seed: Column): Column =
    (conv(substring(md5(seed), 1, 8), 16, 10).cast("bigint").cast("double") + lit(0.5)) /
      lit(4294967296.0)

  /** Laplace(b) inverse-CDF draw from the seeded uniform, rounded to 6
    * decimals (the cross-engine double convention). */
  def laplaceNoise(seed: Column, b: Double): Column = {
    val c = seededUniform(seed) - lit(0.5)
    round(lit(-b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)), 6)
  }

  /** Per-`groupCols` DP release of count(*) and sum(clip(`valueCol`))
    * (a BIGINT measure, e.g. cents). Returns one row per group:
    * group cols, `noisy_count`, `noisy_sum`, `eps_count`, `eps_sum`,
    * `eps_total` — and nothing else (no true values). */
  def dpRelease(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      clip: Long,
      epsCount: Double,
      epsSum: Double,
      releaseId: String
  ): DataFrame = {
    require(clip > 0 && epsCount > 0 && epsSum > 0, "dpRelease: clip and ε must be positive")
    val clipped = least(greatest(col(valueCol), lit(-clip)), lit(clip))
    val grouped = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_true"), sum(clipped).as("s_true"))
    val groupKey = concat_ws("|", groupCols.map(col): _*)
    def seed(metric: String): Column =
      concat_ws(":", lit(releaseId), lit(metric), groupKey)
    grouped
      .withColumn("noisy_count",
        round(col("n_true").cast("double") + laplaceNoise(seed("count"), 1.0 / epsCount), 6))
      .withColumn("noisy_sum",
        round(col("s_true").cast("double") + laplaceNoise(seed("sum"), clip / epsSum), 6))
      .withColumn("eps_count", lit(epsCount))
      .withColumn("eps_sum", lit(epsSum))
      .withColumn("eps_total", lit(epsCount + epsSum))
      .drop("n_true", "s_true")
  }
}
