package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** Pairwise-preference strength estimation — the reward-model data
  * kernel of an RLHF pipeline.  Human raters produce duels ("response A
  * beat response B"); the Bradley–Terry model turns those duels into a
  * per-item strength so mixtures can be weighted (or rankings audited)
  * by preference rather than raw counts.
  *
  * Fitting uses Hunter's MM algorithm (D. R. Hunter, "MM algorithms for
  * generalized Bradley-Terry models", Annals of Statistics 32(1), 2004):
  *
  *   s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j)
  *
  * with W_i = wins of i and n_ij = duels between i and j.  All
  * arithmetic is INTEGER fixed-point — strengths live in micro-units
  * and every division is an integral `div` on DECIMAL(38,0) products —
  * so a fixed round count is bit-identical under any partitioning,
  * engine, or retry, and directly oracle-checkable against an unrolled
  * SQL twin (same reason [[GraphOps.pageRank]] uses micro-units).
  *
  * Scale shape: one duel aggregation to the (i, j, n) pair table, then
  * each MM round is two item-keyed equi-joins (scores onto each side of
  * the pair) + one aggregation per item — shuffle bounded by the pair
  * table, never by the duel count.  No driver state: strengths stay a
  * DataFrame end to end.
  */
object Preference {

  /** Fit Bradley–Terry strengths from a duel log.
    *
    * `duels` must have (winner, loser) columns, one row per duel.
    * Every observed unordered pair is add-one smoothed in BOTH
    * directions (w'_ab = w_ab + 1), the standard regularization that
    * keeps all W_i > 0 so the MM update never divides by zero; the
    * comparison graph should be connected for the strengths to be
    * jointly identified (documented contract — disconnected components
    * converge independently, which is still deterministic).
    *
    * Returns (item, wins, strength_micro) where `wins` is the smoothed
    * win count and `strength_micro` the fixed-point strength after
    * `rounds` MM rounds from a flat 10^6 start.
    */
  def bradleyTerry(duels: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // One aggregation collapses the (possibly huge) duel log to the
    // bounded ordered-pair table; everything after iterates over pairs.
    // duels is typically an expensive upstream join; the pair table is
    // consumed by the smoothing union, the win totals and every MM
    // round — materialize it once (the PageRank edge contract).  All
    // checkpoints go through the lineage-captured helper so the final
    // strengths still trace to the duel columns.
    val wDir = CacheScope.traced(duels
      .groupBy(col("winner").as("a"), col("loser").as("b"))
      .agg(count(lit(1)).as("w")))
    // Smoothed directed wins: +1 in both directions of every observed
    // pair (zero-filled via the reversed union so unseen directions
    // still get their pseudo-win).
    val wSm = CacheScope.traced(wDir.select(col("a"), col("b"), col("w"))
      .union(wDir.select(col("b").as("a"), col("a").as("b"), lit(0L).as("w")))
      .groupBy("a", "b").agg((sum("w") + 1L).as("w")))
    // Pair totals n_ab = w'_ab + w'_ba: self-join on the reversed key —
    // both directions exist by construction, so an inner join is total.
    val rev = wSm.select(col("a").as("rb"), col("b").as("ra"), col("w").as("wr"))
    val edges = wSm.join(rev, col("a") === col("ra") && col("b") === col("rb"))
      .select(col("a"), col("b"), (col("w") + col("wr")).as("n"))
    val wins = wSm.groupBy(col("a").as("item")).agg(sum("w").as("wins"))
    var s = wins.select(col("item"), lit(1000000L).as("s"))
    for (_ <- 1 to rounds) {
      val sa = s.select(col("item").as("ia"), col("s").as("s_a"))
      val sb = s.select(col("item").as("ib"), col("s").as("s_b"))
      // D_a = Σ_b floor(n_ab·10^12 / (s_a + s_b)) — DECIMAL(38,0)
      // product so n up to 10^9 duels per pair cannot overflow, `div`
      // (integral divide, positive operands) so floor semantics match
      // any engine's integer division bit for bit.
      val d = edges
        .join(sa, col("a") === col("ia"))
        .join(sb, col("b") === col("ib"))
        .select(col("a"), expr(
          "(CAST(n AS DECIMAL(38,0)) * 1000000000000) div (s_a + s_b)").as("inv"))
        .groupBy("a").agg(sum("inv").as("d"))
      // cut plan lineage per round — same contract as PageRank: without
      // it the plan chains 2 joins per round and any action replays all
      // earlier rounds.  Lazy: the final action materializes once.
      s = CacheScope.traced(wins.join(d, col("item") === col("a"))
        .select(col("item"), expr(
          "(CAST(wins AS DECIMAL(38,0)) * 1000000000000) div d").as("s")),
        eager = false)
    }
    wins.join(s, "item")
      .select(col("item"), col("wins").cast("long").as("wins"),
        col("s").cast("long").as("strength_micro"))
  }

  /** DPO / reward-model pair mining: per prompt, the (chosen, rejected)
    * response pair — chosen = best-scoring candidate, rejected =
    * worst-scoring — kept only when the margin clears `minMargin`
    * (Rafailov et al. 2023 train on exactly such max-margin pairs; a
    * near-tie pair teaches nothing and a same-response pair is
    * degenerate).
    *
    * Determinism contract: scores are integer fixed-point (cents /
    * micro-units, the repo-wide exactness device).  Tiebreaks are
    * total: chosen = (score DESC, id ASC), rejected = (score ASC,
    * id DESC) — the OPPOSITE id direction, so even an all-tied prompt
    * yields two DISTINCT candidate rows (then margin 0, dropped by any
    * `minMargin >= 1`).
    *
    * Scale shape: both extremes come from the bounded-heap
    * [[graft.plans.TopKPerKey]] (k = 1 — one row ever held per prompt
    * per task, never a candidate-set window); the candidate count is
    * one map-side-combined aggregation; the three per-prompt frames
    * join on the prompt key.  Null scores are excluded up front (a
    * null never trains a pair).
    *
    * @return one row per kept prompt: (keyCol, chosen_id, chosen_score,
    *         rejected_id, rejected_score, margin, n_candidates)
    */
  def dpoPairs(cands: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, minMargin: Long): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    val c = cands.filter(col(keyCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(keyCol), col(idCol), col(scoreCol))
    val chosen = TopK.perKey(c, Seq(col(keyCol)),
        Seq(col(scoreCol).desc, col(idCol).asc), k = 1)
      .select(col(keyCol), col(idCol).as("chosen_id"),
        col(scoreCol).as("chosen_score"))
    val rejected = TopK.perKey(c, Seq(col(keyCol)),
        Seq(col(scoreCol).asc, col(idCol).desc), k = 1)
      .select(col(keyCol), col(idCol).as("rejected_id"),
        col(scoreCol).as("rejected_score"))
    val n = c.groupBy(col(keyCol)).agg(count(lit(1)).as("n_candidates"))
    chosen.join(rejected, Seq(keyCol)).join(n, Seq(keyCol))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("n_candidates") >= 2L && col("margin") >= minMargin)
      .select(col(keyCol), col("chosen_id"), col("chosen_score"),
        col("rejected_id"), col("rejected_score"), col("margin"),
        col("n_candidates"))
  }

  /** Group-relative reward normalization — the advantage kernel of
    * GRPO-style policy optimization (Shao et al., "DeepSeekMath",
    * arXiv:2402.03300 §4.1): each sampled response is scored relative
    * to its OWN prompt's candidate group,
    * `A_i = (r_i − mean(r)) / std(r)`, so prompts with easy/hard
    * reward scales contribute comparably and a constant-reward prompt
    * contributes nothing.
    *
    * Exactness: rewards arrive as integer fixed-point (`centsCol`, the
    * repo-wide device); per-group moments are exact DECIMAL(38,0)
    * sums, and the advantage is evaluated as the cross-multiplied form
    * `(r·n − Σr) / √(n·Σr² − (Σr)²)` — ONE division and ONE IEEE sqrt
    * of exact integers (both correctly rounded by IEEE-754, hence
    * engine-identical), rounded to 6 dp.  Note √(n·Σr²−(Σr)²) = n·σ
    * with σ the population std, matching the population-normalized
    * GRPO estimator.
    *
    * Degenerate groups — a single sample or zero variance — carry no
    * learning signal: they are KEPT (flagged `degenerate`, advantage
    * 0.0) so rows never silently vanish and the caller decides whether
    * to drop them.
    *
    * Scale shape: one map-side-combined aggregation to the per-group
    * moment table (one row per prompt), then one equi-join of that
    * tiny frame back onto the samples on the group key — no window
    * over the candidate set, no driver state; group cardinality is the
    * only shuffle key.
    *
    * @return one row per sample: (groupCol, idCol, centsCol, n,
    *         degenerate, advantage)
    */
  def grpoAdvantage(samples: DataFrame, groupCol: String, idCol: String,
      centsCol: String): DataFrame = {
    def d38(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val s = samples.filter(col(groupCol).isNotNull && col(centsCol).isNotNull)
      .select(col(groupCol), col(idCol), col(centsCol))
    val stats = s.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(expr(d38(centsCol))).as("__s1"),
        sum(expr(s"${d38(centsCol)} * ${d38(centsCol)}")).as("__s2"))
    s.join(stats, Seq(groupCol))
      .withColumn("__num",
        expr(s"CAST(n AS DECIMAL(38,0)) * $centsCol - __s1"))
      .withColumn("__rad",
        expr("CAST(n AS DECIMAL(38,0)) * __s2 - __s1 * __s1"))
      .withColumn("degenerate",
        (col("n") < 2L) || (col("__rad") === 0))
      .withColumn("advantage", when(col("degenerate"), lit(0.0))
        .otherwise(round(col("__num").cast("double") /
          sqrt(col("__rad").cast("double")), 6)))
      .select(col(groupCol), col(idCol), col(centsCol), col("n"),
        col("degenerate"), col("advantage"))
  }
}
