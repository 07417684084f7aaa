package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Agreement, Preference}
import graft.plans.TopK

/** Preference / label-quality gates — the human-feedback corner of the
  * training-data pipeline:
  *
  *  - Bradley–Terry preference-strength fitting (RLHF reward-model
  *    data kernel, integer fixed-point MM rounds)    q_bradley_terry
  *  - Cohen's κ two-rater agreement (exact ppm)      q_cohen_kappa
  *  - Fleiss' κ R-rater agreement (exact ppm)        q_fleiss_kappa
  *
  * Every statistic is integer-exact (DECIMAL(38,0) cross
  * multiplication, sign-split integral division), so the DuckDB twins
  * replay the identical arithmetic and the hashes are bit-exact.
  */
object PrefQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Duels derived deterministically from consecutive event pairs:
    // items are user cohorts (user_id mod 40), the higher integer-cents
    // value wins, exact ties go to the lesser item id.  Three MM rounds
    // of integer fixed-point Bradley–Terry over the add-one-smoothed
    // pair table.
    "q_bradley_terry" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events").where(col("value").isNotNull)
      val e1 = ev.where(pmod(col("event_id"), lit(2L)) === 0L)
        .select(col("event_id").as("id1"),
          pmod(col("user_id"), lit(40L)).as("i1"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c1"))
      val e2 = ev
        .select((col("event_id") - 1L).as("id1"),
          pmod(col("user_id"), lit(40L)).as("i2"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c2"))
      val duels = e1.join(e2, "id1").where(col("i1") =!= col("i2"))
        .select(
          when(col("c1") > col("c2"), col("i1"))
            .when(col("c2") > col("c1"), col("i2"))
            .otherwise(least(col("i1"), col("i2"))).as("winner"),
          when(col("c1") > col("c2"), col("i2"))
            .when(col("c2") > col("c1"), col("i1"))
            .otherwise(greatest(col("i1"), col("i2"))).as("loser"))
      Preference.bradleyTerry(duels, rounds = 3)
        .orderBy(col("item"))
    },

    // Two "raters" built from adjacent documents (doc n's lang vs doc
    // n+1's lang): a deterministic, engine-trivial labelling whose
    // agreement is near-chance — which is exactly what makes it a good
    // gate for the sign-split ppm arithmetic (κ lands close to 0 and
    // may be negative).
    "q_cohen_kappa" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("lang").isNotNull).select(col("doc_id"), col("lang"))
      val d2 = d.select((col("doc_id") - 1L).as("doc_id"),
        col("lang").as("labelB"))
      Agreement.cohenKappa(
        d.join(d2, "doc_id").select(col("lang").as("labelA"), col("labelB")))
    },

    // Ordinal agreement: adjacent documents rated on a 10-level length
    // scale — linear weights make one-notch misses count partially,
    // which plain κ (q_cohen_kappa) cannot express.
    "q_weighted_kappa" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), expr("least(n_chars div 200, 9)").as("lv"))
      val b = d.select((col("doc_id") - 1L).as("doc_id"),
        col("lv").as("labelB"))
      Agreement.cohenKappaWeighted(
        d.join(b, "doc_id").select(col("lv").as("labelA"), col("labelB")))
    },

    // Fixed panel of R=3 "raters" per item: each user's first three
    // event types (by ts, event_id — unique tiebreak) rate the item
    // `user_id`; users with fewer than three typed events drop out.
    // First-3 selection runs through the bounded-heap TopKPerKey, not a
    // raw per-user window.
    "q_fleiss_kappa" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .where(col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val top3 = TopK.perKey(ev, Seq(col("user_id")),
        Seq(col("ts"), col("event_id")), 3)
      val full = top3.groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") === 3L).select("user_id")
      val ratings = top3.join(full, "user_id")
        .select(col("user_id").as("item"), col("event_type").as("category"))
      Agreement.fleissKappa(ratings, r = 3)
    },

    // Variable-panel agreement: each user's first ≤ 12 typed events
    // (by ts, event_id) rate the unit `user_id` — units keep however
    // many ratings they have (single-rating units drop as unpairable),
    // the case Fleiss' fixed-panel contract excludes.  The ≤ 12 bound
    // comes from the bounded-heap TopKPerKey and is what licenses the
    // exact lcm(1..12) weight scaling.
    "q_krippendorff" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .where(col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val top12 = TopK.perKey(ev, Seq(col("user_id")),
        Seq(col("ts"), col("event_id")), 12)
      Agreement.krippendorffAlpha(top12, "user_id", "event_type")
    },

    // DPO pair mining: prompts are user cohorts (user_id mod 500),
    // candidates their events scored in integer cents; chosen/rejected
    // are the exact per-prompt extremes (opposite-direction id
    // tiebreaks so even all-tied prompts pair two DISTINCT rows) via
    // two k=1 bounded-heap TopKPerKey passes, margin gate at 50 cents.
    "q_dpo_pairs" -> { (s, dir) =>
      val cands = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(pmod(col("user_id"), lit(500L)).as("prompt_id"),
          col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      Preference.dpoPairs(cands, "prompt_id", "event_id", "cents",
          minMargin = 50L)
        .orderBy(col("prompt_id"))
    },

    // GRPO group-relative advantages: prompts are user cohorts
    // (user_id mod 200), candidate rewards their event values in
    // integer cents; the advantage is the cross-multiplied
    // (r·n − Σr)/√(n·Σr² − (Σr)²) — exact integer moments, one IEEE
    // sqrt — with degenerate (single-sample / zero-variance) groups
    // kept and flagged rather than dropped.
    "q_grpo_advantage" -> { (s, dir) =>
      val samples = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(pmod(col("user_id"), lit(200L)).as("prompt_id"),
          col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      Preference.grpoAdvantage(samples, "prompt_id", "event_id", "cents")
        .orderBy(col("prompt_id"), col("event_id"))
    })

  private val btMmRound = (i: Int) => {
    val prev = if (i == 1) "s0" else s"s${i - 1}"
    s"""d$i AS (SELECT e.a,
       |    sum((CAST(e.n AS HUGEINT) * 1000000000000) // (sa.s + sb.s)) AS dd
       |  FROM e JOIN $prev sa ON sa.item = e.a
       |    JOIN $prev sb ON sb.item = e.b GROUP BY 1),
       |s$i AS (SELECT w.item,
       |    CAST((CAST(w.wins AS HUGEINT) * 1000000000000) // d$i.dd AS BIGINT) AS s
       |  FROM wins w JOIN d$i ON d$i.a = w.item)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_bradley_terry" ->
      s"""WITH duels AS (
         |  SELECT CASE WHEN c1 > c2 THEN i1 WHEN c2 > c1 THEN i2
         |           ELSE least(i1, i2) END AS winner,
         |         CASE WHEN c1 > c2 THEN i2 WHEN c2 > c1 THEN i1
         |           ELSE greatest(i1, i2) END AS loser
         |  FROM (
         |    SELECT e1.user_id % 40 AS i1, e2.user_id % 40 AS i2,
         |      CAST(round(e1.value * 100) AS BIGINT) AS c1,
         |      CAST(round(e2.value * 100) AS BIGINT) AS c2
         |    FROM events e1 JOIN events e2 ON e2.event_id = e1.event_id + 1
         |    WHERE e1.event_id % 2 = 0
         |      AND e1.value IS NOT NULL AND e2.value IS NOT NULL)
         |  WHERE i1 <> i2),
         |wdir AS (SELECT winner AS a, loser AS b, count(*) AS w
         |  FROM duels GROUP BY 1, 2),
         |wsm AS (SELECT a, b, CAST(sum(w) + 1 AS BIGINT) AS w FROM (
         |    SELECT a, b, w FROM wdir
         |    UNION ALL SELECT b, a, 0 FROM wdir) GROUP BY 1, 2),
         |e AS (SELECT p.a, p.b, p.w + q.w AS n
         |  FROM wsm p JOIN wsm q ON p.a = q.b AND p.b = q.a),
         |wins AS (SELECT a AS item, CAST(sum(w) AS BIGINT) AS wins
         |  FROM wsm GROUP BY 1),
         |s0 AS (SELECT item, CAST(1000000 AS BIGINT) AS s FROM wins),
         |${btMmRound(1)},
         |${btMmRound(2)},
         |${btMmRound(3)}
         |SELECT w.item, w.wins, s3.s AS strength_micro
         |FROM wins w JOIN s3 ON s3.item = w.item
         |ORDER BY w.item""".stripMargin,

    "q_cohen_kappa" ->
      """WITH l AS (SELECT a.lang AS la, b.lang AS lb
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.lang IS NOT NULL AND b.lang IS NOT NULL),
        |cells AS (SELECT la, lb, count(*) AS c FROM l GROUP BY 1, 2),
        |am AS (SELECT la AS k, CAST(sum(c) AS BIGINT) AS a_k
        |  FROM cells GROUP BY 1),
        |bm AS (SELECT lb AS k, CAST(sum(c) AS BIGINT) AS b_k
        |  FROM cells GROUP BY 1),
        |pe AS (SELECT sum(CAST(a_k AS HUGEINT) * b_k) AS pe_num
        |  FROM am JOIN bm USING (k)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM l)
        |SELECT n, n_agree,
        |  CAST((CAST(n_agree AS HUGEINT) * 1000000) // n AS BIGINT) AS po_ppm,
        |  CAST((pe_num * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |    AS pe_ppm,
        |  CAST(CAST(n AS HUGEINT) * n_agree - pe_num AS BIGINT) AS kappa_num,
        |  CAST(CAST(n AS HUGEINT) * n - pe_num AS BIGINT) AS kappa_den,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * n - pe_num = 0 THEN -1000001
        |    WHEN CAST(n AS HUGEINT) * n_agree - pe_num < 0
        |    THEN -(((pe_num - CAST(n AS HUGEINT) * n_agree) * 1000000)
        |           // (CAST(n AS HUGEINT) * n - pe_num))
        |    ELSE (((CAST(n AS HUGEINT) * n_agree - pe_num) * 1000000)
        |          // (CAST(n AS HUGEINT) * n - pe_num)) END AS BIGINT)
        |    AS kappa_ppm
        |FROM t, pe""".stripMargin,

    "q_weighted_kappa" ->
      """WITH l AS (SELECT least(a.n_chars // 200, 9) AS la,
        |    least(b.n_chars // 200, 9) AS lb
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |cells AS (SELECT la, lb, count(*) AS c FROM l GROUP BY 1, 2),
        |am AS (SELECT la AS i, CAST(sum(c) AS BIGINT) AS a_i
        |  FROM cells GROUP BY 1),
        |bm AS (SELECT lb AS j, CAST(sum(c) AS BIGINT) AS b_j
        |  FROM cells GROUP BY 1),
        |sec AS (SELECT sum(abs(i - j) * CAST(a_i AS HUGEINT) * b_j) AS se
        |  FROM am, bm),
        |obs AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(abs(la - lb)) AS BIGINT) AS so FROM l)
        |SELECT n, so, CAST(se AS BIGINT) AS se,
        |  CAST(CASE WHEN se = 0 THEN -1000001
        |    WHEN se - CAST(n AS HUGEINT) * so < 0 THEN
        |      -(((CAST(n AS HUGEINT) * so - se) * 1000000) // se)
        |    ELSE ((se - CAST(n AS HUGEINT) * so) * 1000000) // se
        |    END AS BIGINT) AS kappa_ppm
        |FROM obs, sec""".stripMargin,

    "q_fleiss_kappa" ->
      """WITH r AS (SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type IS NOT NULL),
        |t3 AS (SELECT user_id, event_type FROM r WHERE rn <= 3),
        |ok AS (SELECT user_id FROM t3 GROUP BY 1 HAVING count(*) = 3),
        |nik AS (SELECT t.user_id AS item, t.event_type AS category,
        |    count(*) AS n_ik
        |  FROM t3 t JOIN ok USING (user_id) GROUP BY 1, 2),
        |sq AS (SELECT sum(CAST(n_ik AS HUGEINT) * n_ik) AS sum_sq,
        |    CAST(count(DISTINCT item) AS BIGINT) AS n_items FROM nik),
        |skt AS (SELECT sum(CAST(s_k AS HUGEINT) * s_k) AS sum_sk_sq FROM (
        |    SELECT category, sum(n_ik) AS s_k FROM nik GROUP BY 1))
        |SELECT n_items, CAST(3 AS BIGINT) AS r,
        |  CAST(((sum_sq - n_items * 3) * 1000000)
        |    // (CAST(n_items AS HUGEINT) * 3 * 2) AS BIGINT) AS po_ppm,
        |  CAST((sum_sk_sq * 1000000)
        |    // (CAST(n_items AS HUGEINT) * 3 * n_items * 3) AS BIGINT) AS pe_ppm,
        |  CAST(CASE WHEN CAST(n_items AS HUGEINT) * 3 * 2
        |        * (CAST(n_items AS HUGEINT) * 3 * n_items * 3 - sum_sk_sq) = 0
        |      THEN -1000001
        |    WHEN (sum_sq - n_items * 3)
        |        * (CAST(n_items AS HUGEINT) * 3 * n_items * 3)
        |        - CAST(n_items AS HUGEINT) * 3 * 2 * sum_sk_sq < 0
        |    THEN -(((CAST(n_items AS HUGEINT) * 3 * 2 * sum_sk_sq
        |             - (sum_sq - n_items * 3)
        |               * (CAST(n_items AS HUGEINT) * 3 * n_items * 3))
        |            * 1000000)
        |           // (CAST(n_items AS HUGEINT) * 3 * 2
        |              * (CAST(n_items AS HUGEINT) * 3 * n_items * 3
        |                 - sum_sk_sq)))
        |    ELSE ((((sum_sq - n_items * 3)
        |            * (CAST(n_items AS HUGEINT) * 3 * n_items * 3)
        |            - CAST(n_items AS HUGEINT) * 3 * 2 * sum_sk_sq)
        |           * 1000000)
        |          // (CAST(n_items AS HUGEINT) * 3 * 2
        |             * (CAST(n_items AS HUGEINT) * 3 * n_items * 3
        |                - sum_sk_sq))) END AS BIGINT) AS kappa_ppm
        |FROM sq, skt""".stripMargin,

    "q_krippendorff" ->
      """WITH r AS (SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type IS NOT NULL),
        |t AS (SELECT user_id, event_type FROM r WHERE rn <= 12),
        |nuc AS (SELECT user_id, event_type, count(*) AS n
        |  FROM t GROUP BY 1, 2),
        |u AS (SELECT user_id, sum(n) AS m,
        |    sum(CAST(n AS HUGEINT) * n) AS sq
        |  FROM nuc GROUP BY 1 HAVING sum(n) >= 2),
        |don AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
        |    CAST(sum(m) AS BIGINT) AS bign,
        |    sum((CAST(m AS HUGEINT) * m - sq) * (27720 // (m - 1)))
        |      AS do_num
        |  FROM u),
        |sk AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |    sum(CAST(nc AS HUGEINT) * nc) AS sksq FROM (
        |    SELECT nuc.event_type, sum(nuc.n) AS nc
        |    FROM nuc JOIN u USING (user_id) GROUP BY 1))
        |SELECT n_units, bign AS n_pairable, n_categories,
        |  CAST(CASE WHEN CAST(bign AS HUGEINT) * bign - sksq = 0
        |    THEN -2000000
        |    WHEN 27720 * (CAST(bign AS HUGEINT) * bign - sksq)
        |        - (bign - 1) * do_num < 0 THEN
        |      -((((bign - 1) * do_num
        |          - 27720 * (CAST(bign AS HUGEINT) * bign - sksq))
        |         * 1000000)
        |        // (27720 * (CAST(bign AS HUGEINT) * bign - sksq)))
        |    ELSE ((27720 * (CAST(bign AS HUGEINT) * bign - sksq)
        |           - (bign - 1) * do_num) * 1000000)
        |      // (27720 * (CAST(bign AS HUGEINT) * bign - sksq))
        |    END AS BIGINT) AS alpha_ppm
        |FROM don, sk""".stripMargin,

    "q_dpo_pairs" ->
      """WITH t AS (SELECT user_id % 500 AS prompt_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |ch AS (SELECT prompt_id, event_id AS chosen_id,
        |    cents AS chosen_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY cents DESC, event_id ASC) AS rn FROM t)
        |  WHERE rn = 1),
        |rj AS (SELECT prompt_id, event_id AS rejected_id,
        |    cents AS rejected_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY cents ASC, event_id DESC) AS rn FROM t)
        |  WHERE rn = 1),
        |n AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM t GROUP BY 1)
        |SELECT prompt_id, chosen_id, chosen_score, rejected_id,
        |  rejected_score, chosen_score - rejected_score AS margin,
        |  n_candidates
        |FROM ch JOIN rj USING (prompt_id) JOIN n USING (prompt_id)
        |WHERE n_candidates >= 2 AND chosen_score - rejected_score >= 50
        |ORDER BY prompt_id""".stripMargin,

    "q_grpo_advantage" ->
      """WITH t AS (SELECT user_id % 200 AS prompt_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(cents AS HUGEINT)) AS s1,
        |    sum(CAST(cents AS HUGEINT) * cents) AS s2
        |  FROM t GROUP BY 1)
        |SELECT t.prompt_id, t.event_id, t.cents, g.n,
        |  (g.n < 2 OR g.n * g.s2 - g.s1 * g.s1 = 0) AS degenerate,
        |  CASE WHEN g.n < 2 OR g.n * g.s2 - g.s1 * g.s1 = 0 THEN 0.0
        |    ELSE round(CAST(g.n * t.cents - g.s1 AS DOUBLE)
        |      / sqrt(CAST(g.n * g.s2 - g.s1 * g.s1 AS DOUBLE)), 6)
        |  END AS advantage
        |FROM t JOIN g USING (prompt_id)
        |ORDER BY prompt_id, event_id""".stripMargin)
}
