package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** Conversation / preference-data preparation: the turn-structured
  * half of an instruction-tuning pipeline.  A conversation is a keyed,
  * time-ordered sequence of turns; the two passes every chat-SFT prep
  * runs are (a) context-window truncation — keep the most recent
  * suffix of turns that fits a token budget — and (b) best-of-n
  * candidate selection over scored responses (rejection sampling).
  *
  * Scale design: truncation is one window partitioned by conversation
  * (per-key rows bounded by the conversation-length contract — the
  * same bound [[TimeSeries]] and the streaming GroupState ops rely
  * on); selection funnels through the bounded-heap
  * [[graft.plans.TopKPerKey]], never a window over all candidates.
  */
object ChatOps {

  /** Suffix-under-budget context truncation with turn-structure QA.
    *
    * Keeps, per conversation, the LONGEST suffix of turns (most recent
    * first) whose cumulative `costCol` stays ≤ budget — the standard
    * "drop oldest turns until the prompt fits" policy.  Also reports
    * role-alternation violations (adjacent turns with the same role —
    * malformed transcripts that SFT collators reject).
    *
    * Costs must be non-negative (the suffix-keep property relies on a
    * monotone running sum); enforced per row so a bad feed fails loudly
    * instead of silently keeping a non-suffix.
    *
    * @return one row per conversation: (convCol, n_turns, n_kept,
    *         kept_cost, first_kept_event = min tieCol among kept turns
    *         (null when nothing fits), n_role_repeats)
    */
  def contextTruncate(turns: DataFrame, convCol: String, tsCol: String,
      tieCol: String, roleCol: String, costCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    // A null cost is a different contract breach than a negative one
    // (missing field vs bad arithmetic upstream) — name each in its
    // error so the caller fixes the right thing.
    val cost = when(col(costCol).isNull,
        raise_error(concat(lit(s"null $costCol for turn "),
          coalesce(col(tieCol).cast("string"), lit("<null>")))))
      .when(col(costCol) >= 0L, col(costCol).cast("long"))
      .otherwise(raise_error(concat(lit(s"negative $costCol for turn "),
        col(tieCol).cast("string"))))
    val fromEnd = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val marked = turns
      .withColumn("__cost", cost)
      .withColumn("__tail", sum(col("__cost")).over(fromEnd))
      .withColumn("__keep", col("__tail") <= budget)
      .withColumn("__rep",
        when(lag(col(roleCol), 1).over(fwd) === col(roleCol), 1L)
          .otherwise(0L))
    marked.groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("__keep"), 1L).otherwise(0L)).cast("long")
          .as("n_kept"),
        sum(when(col("__keep"), col("__cost")).otherwise(0L)).cast("long")
          .as("kept_cost"),
        min(when(col("__keep"), col(tieCol))).as("first_kept_event"),
        sum(col("__rep")).cast("long").as("n_role_repeats"))
  }

  /** Best-of-n selection with acceptance accounting (rejection
    * sampling, Bai et al. 2022 / RFT-style): per prompt, the single
    * best-scoring candidate (deterministic tiebreak: smaller id wins)
    * plus how many candidates existed and how many cleared the
    * acceptance threshold.
    *
    * The winner comes from the bounded-heap [[graft.plans.TopKPerKey]]
    * (k=1 — one row ever held per prompt per task); the counts are one
    * map-side-combined aggregation.  Nothing shuffles candidate
    * payloads twice and no window sees the full candidate set.
    *
    * @return one row per prompt: (keyCol, best_id, best_score,
    *         n_candidates, n_accepted)
    */
  def bestOfN(cands: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, threshold: Double): DataFrame = {
    val best = TopK.perKey(
        cands.select(col(keyCol), col(idCol), col(scoreCol)),
        Seq(col(keyCol)), Seq(col(scoreCol).desc, col(idCol).asc), k = 1)
      .select(col(keyCol), col(idCol).as("best_id"),
        col(scoreCol).as("best_score"))
    val stats = cands.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col(scoreCol) >= threshold, 1L).otherwise(0L))
          .cast("long").as("n_accepted"))
    best.join(stats, Seq(keyCol))
  }

  /** Chat-template audit — the structural QA gate a transcript must
    * pass before templating into SFT examples: per conversation, the
    * violation counts that silently corrupt training if unchecked
    * (role repeats break alternation; empty turns train the template
    * tokens alone; unknown roles crash the renderer; a late system
    * turn leaks instructions mid-dialogue; a conversation must open
    * with system or user).
    *
    * Scale shape: one per-conversation forward window (rows per key
    * bounded by the transcript contract — the [[contextTruncate]]
    * bound) and one aggregation to a row per conversation.
    *
    * @return (convCol, n_turns, first_role, n_role_repeats,
    *         n_empty_turns, n_bad_roles, n_late_system, ok)
    */
  def templateAudit(turns: DataFrame, convCol: String, tsCol: String,
      tieCol: String, roleCol: String, textCol: String): DataFrame = {
    val fwd = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val marked = turns
      .withColumn("__rn", row_number().over(fwd))
      .withColumn("__rep",
        when(lag(col(roleCol), 1).over(fwd) === col(roleCol), 1L)
          .otherwise(0L))
      .withColumn("__empty",
        when(col(textCol).isNull ||
          length(trim(col(textCol))) === 0, 1L).otherwise(0L))
      .withColumn("__bad",
        when(col(roleCol).isin("system", "user", "assistant"), 0L)
          .otherwise(1L))
      .withColumn("__late",
        when(col(roleCol) === "system" && col("__rn") > 1, 1L)
          .otherwise(0L))
    marked.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        max(when(col("__rn") === 1, col(roleCol))).as("first_role"),
        sum(col("__rep")).cast("long").as("n_role_repeats"),
        sum(col("__empty")).cast("long").as("n_empty_turns"),
        sum(col("__bad")).cast("long").as("n_bad_roles"),
        sum(col("__late")).cast("long").as("n_late_system"))
      .withColumn("ok", coalesce(
        col("n_role_repeats") === 0L && col("n_empty_turns") === 0L &&
          col("n_bad_roles") === 0L && col("n_late_system") === 0L &&
          col("first_role").isin("system", "user"),
        lit(false)))
  }

  /** Conversation-TREE linearization: branched chat logs (several
    * candidate replies per turn — the shape preference data arrives
    * in) flattened to one root-to-leaf PATH per leaf, the unit an SFT
    * pipeline actually trains on.  `parentCol` is null at roots; a
    * leaf is a node no row points at.
    *
    * Determinism: the path is the payloads joined by `sep` in
    * root→leaf order — no ordering choices exist (each node has ONE
    * parent).
    *
    * Scale shape: breadth-first frontier extension — one parent-keyed
    * equi-join per depth level, frontier checkpointed per round,
    * leaves peeled off as they complete.  Depth is bounded by the
    * transcript contract: a frontier still alive at `maxDepth` fails
    * LOUDLY (deeper tree than contract).  Nodes unreachable from any
    * root — orphans, and parent cycles (necessarily unrooted, since
    * every node has ONE parent) — drop like any unreachable branch.
    * The per-round driver action is one emptiness probe; paths never
    * collect.
    *
    * @return one row per leaf: (leaf_id, depth, path)
    */
  def linearizeTree(nodes: DataFrame, idCol: String, parentCol: String,
      payloadCol: String, maxDepth: Int, sep: String = ">"): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 32,
      s"maxDepth must be in 1..32, got $maxDepth")
    val n = CacheScope.traced(nodes.select(
      col(idCol).cast("long").as("__id"),
      col(parentCol).cast("long").as("__par"),
      col(payloadCol).cast("string").as("__pl")))
    // a node is a leaf when no row names it as parent.
    val leaves = CacheScope.traced(n.select(col("__id"))
      .join(n.select(col("__par").as("__id")).filter(col("__id").isNotNull)
        .distinct(), Seq("__id"), "left_anti"))
    var frontier = CacheScope.traced(n.filter(col("__par").isNull)
      .select(col("__id"), lit(1L).as("depth"), col("__pl").as("path")))
    var out = frontier.join(leaves, Seq("__id"))
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      val next = CacheScope.traced(frontier
        .select(col("__id").as("__fid"), col("depth"), col("path"))
        .join(n, col("__par") === col("__fid"))
        .select(col("__id"), (col("depth") + 1L).as("depth"),
          concat(col("path"), lit(sep), col("__pl")).as("path")))
      out = out.union(next.join(leaves, Seq("__id")))
      frontier = next.join(leaves, Seq("__id"), "left_anti")
      depth += 1
    }
    if (!frontier.isEmpty)
      throw new IllegalStateException(
        s"linearizeTree: frontier still alive at maxDepth=$maxDepth — " +
          "tree deeper than the transcript contract")
    out.select(col("__id").as("leaf_id"), col("depth"), col("path"))
  }
}
