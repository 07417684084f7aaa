package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ChatOps, Similarity}

/** Conversation-prep and embedding-fidelity gates — the instruction-
  * tuning corner of the training-data pipeline:
  *
  *  - context-window turn truncation + role-alternation QA
  *    (suffix-under-budget keep policy)             q_chat_truncate
  *  - best-of-n candidate selection with acceptance
  *    accounting (rejection sampling, heap top-1)   q_best_of_n
  *  - Matryoshka truncation fidelity (overlap@k of
  *    full-dim vs prefix-dim exact neighbors)       q_matryoshka
  *
  * Conversations are played by the events feed (user = conversation,
  * event = turn, event_type = role, cost = rendered-turn length);
  * candidates by (user = prompt, event = candidate, value = score).
  */
object ChatQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Keep the most recent turns that fit a 200-char context budget;
    // count adjacent same-role turns (malformed transcripts).  The
    // suffix property and the per-conversation window bound are the
    // ChatOps.contextTruncate contract.
    "q_chat_truncate" -> { (s, dir) =>
      val turns = Tables.load(s, dir, "events")
        .withColumn("cost",
          (coalesce(length(col("props")), lit(0)) +
            coalesce(length(col("event_type")), lit(0))).cast("long"))
      ChatOps.contextTruncate(turns, "user_id", "ts", "event_id",
          "event_type", "cost", budget = 200L)
        .orderBy(col("user_id"))
    },

    // Top-1 candidate per prompt through the bounded-heap TopKPerKey
    // (score desc, id asc tiebreak) + acceptance counts at score >= 10.
    "q_best_of_n" -> { (s, dir) =>
      ChatOps.bestOfN(Tables.load(s, dir, "events"),
          "user_id", "event_id", "value", threshold = 10.0)
        .orderBy(col("user_id"))
    },

    // Matryoshka check: do the first 16 of 64 dims preserve the exact
    // top-5 neighbors?  Deterministic ≤ 20-query batch (vec_id < 500,
    // % 25 = 0; the limit makes the brute passes' broadcast
    // plan-bounded, the q_knn_brute device); overlap@5 is an integer
    // so the gate is tie-break-exact, and the prefix energy ratio
    // replays the same double fold in DuckDB.
    "q_matryoshka" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 500L &&
        pmod(col("vec_id"), lit(25L)) === 0L).limit(20)
      Similarity.truncationOverlap(emb, q, k = 5, m = 16)
        .orderBy(col("query_id"))
    },

    // Chat-template audit over event-derived transcripts: per
    // conversation the violation counts (role repeats, empty turns,
    // unknown roles, late system, bad opener) that corrupt SFT
    // templating if unchecked — the unmapped event types double as
    // realistic bad-role hits.
    "q_chat_audit" -> { (s, dir) =>
      val turns = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "view", "user")
            .when(col("event_type") === "click", "assistant")
            .when(col("event_type") === "purchase", "system")
            .otherwise(col("event_type")).as("role"),
          col("props").as("text"))
      ChatOps.templateAudit(turns, "user_id", "ts", "event_id",
          "role", "text")
        .orderBy(col("user_id"))
    },

    // Conversation-tree linearization: a deterministic ternary tree
    // over the first 2000 events (parent = id div 3, root 0) flattens
    // to one root-to-leaf path per leaf — the branched-chat-log →
    // SFT-paths prep; breadth-first frontier joins, depth bounded 12.
    "q_chat_tree" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_id") < 2000L)
        .select(col("event_id"),
          when(col("event_id") === 0L, lit(null).cast("long"))
            .otherwise(expr("CAST(event_id div 3 AS BIGINT)"))
            .as("parent_id"),
          coalesce(col("event_type"), lit("-")).as("payload"))
      ChatOps.linearizeTree(ev, "event_id", "parent_id", "payload",
          maxDepth = 12)
        .orderBy(col("leaf_id"))
    },

    // Rank-aware matryoshka fidelity: exact average overlap (AO, the
    // RBO p->1 limit) between full-dim and 16-dim top-5 rankings over
    // the same bounded query batch — integer lcm(1..5)-weighted, so
    // wrong ORDER is penalized where q_matryoshka's set overlap
    // wouldn't see it.
    "q_ranked_overlap" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 500L &&
        pmod(col("vec_id"), lit(25L)) === 0L).limit(20)
      Similarity.rankedTruncationOverlap(emb, q, k = 5, m = 16)
        .orderBy(col("query_id"))
    },

    // kNN label-noise audit over the same bounded query batch: does a
    // vector's own label match its 5 exact nearest neighbors' majority
    // vote (most votes, then smaller label)?  Disagreements flag
    // mislabels / non-separating embeddings before a filter model
    // trains on them.
    "q_knn_label_agree" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 500L &&
        pmod(col("vec_id"), lit(25L)) === 0L).limit(20)
      Similarity.knnLabelAgreement(emb, q, k = 5)
        .orderBy(col("query_id"))
    })

  val oracle: Map[String, String] = Map(
    "q_chat_truncate" ->
      """WITH t AS (SELECT user_id, event_id, ts, event_type,
        |    coalesce(length(props), 0) + coalesce(length(event_type), 0)
        |      AS cost
        |  FROM events),
        |w AS (SELECT *,
        |    CAST(sum(cost) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS tail,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) = event_type THEN 1 ELSE 0 END AS rep
        |  FROM t)
        |SELECT user_id, count(*) AS n_turns,
        |  CAST(sum(CASE WHEN tail <= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN tail <= 200 THEN cost ELSE 0 END) AS BIGINT)
        |    AS kept_cost,
        |  min(CASE WHEN tail <= 200 THEN event_id END) AS first_kept_event,
        |  CAST(sum(rep) AS BIGINT) AS n_role_repeats
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_best_of_n" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events),
        |s AS (SELECT user_id, count(*) AS n_candidates,
        |    CAST(sum(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_accepted
        |  FROM events GROUP BY 1)
        |SELECT r.user_id, r.event_id AS best_id, r.value AS best_score,
        |  s.n_candidates, s.n_accepted
        |FROM r JOIN s USING (user_id) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_matryoshka" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 500 AND vec_id % 25 = 0),
        |f AS (SELECT query_id, corpus_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |t AS (SELECT query_id, corpus_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(CAST(q.embedding[1:16] AS DOUBLE[]),
        |          CAST(c.embedding[1:16] AS DOUBLE[])) DESC, c.vec_id)
        |        AS rank
        |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |o AS (SELECT f.query_id, count(*) AS n_overlap FROM f JOIN t
        |    ON f.query_id = t.query_id AND f.corpus_id = t.corpus_id
        |  GROUP BY 1),
        |e AS (SELECT vec_id AS query_id,
        |    round(list_sum(list_transform(CAST(embedding[1:16] AS DOUBLE[]),
        |        x -> x * x))
        |      / list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |        x -> x * x)), 6) AS energy_ratio
        |  FROM q)
        |SELECT e.query_id, coalesce(o.n_overlap, 0) AS n_overlap,
        |  e.energy_ratio
        |FROM e LEFT JOIN o USING (query_id) ORDER BY query_id""".stripMargin,

    "q_chat_audit" ->
      """WITH t AS (SELECT user_id,
        |    CASE event_type WHEN 'view' THEN 'user'
        |      WHEN 'click' THEN 'assistant'
        |      WHEN 'purchase' THEN 'system'
        |      ELSE event_type END AS role,
        |    props AS text, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |m AS (SELECT user_id, role, text,
        |    row_number() OVER w AS rn, lag(role) OVER w AS prev
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  max(CASE WHEN rn = 1 THEN role END) AS first_role,
        |  CAST(sum(CASE WHEN prev = role THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_role_repeats,
        |  CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_turns,
        |  CAST(sum(CASE WHEN role IN ('system', 'user', 'assistant')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_roles,
        |  CAST(sum(CASE WHEN role = 'system' AND rn > 1 THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_late_system,
        |  coalesce(
        |    sum(CASE WHEN prev = role THEN 1 ELSE 0 END) = 0
        |    AND sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
        |      THEN 1 ELSE 0 END) = 0
        |    AND sum(CASE WHEN role IN ('system', 'user', 'assistant')
        |      THEN 0 ELSE 1 END) = 0
        |    AND sum(CASE WHEN role = 'system' AND rn > 1 THEN 1 ELSE 0
        |      END) = 0
        |    AND max(CASE WHEN rn = 1 THEN role END)
        |      IN ('system', 'user'), FALSE) AS ok
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_chat_tree" ->
      """WITH RECURSIVE n AS (SELECT event_id AS id,
        |    CASE WHEN event_id = 0 THEN NULL
        |         ELSE event_id // 3 END AS par,
        |    coalesce(event_type, '-') AS pl
        |  FROM events WHERE event_id < 2000),
        |p AS (
        |  SELECT id, 1 AS depth, pl AS path FROM n WHERE par IS NULL
        |  UNION ALL
        |  SELECT n.id, p.depth + 1, p.path || '>' || n.pl
        |  FROM p JOIN n ON n.par = p.id)
        |SELECT p.id AS leaf_id, CAST(depth AS BIGINT) AS depth, path
        |FROM p WHERE p.id NOT IN
        |  (SELECT par FROM n WHERE par IS NOT NULL)
        |ORDER BY leaf_id""".stripMargin,

    // suffix weights c(m) = sum_{d=m..5} 60/d = [137, 77, 47, 27, 12];
    // ao_ppm = 1e6 * sum(c(max(ra, rb))) // (60 * 5).
    "q_ranked_overlap" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 500 AND vec_id % 25 = 0),
        |f AS (SELECT query_id, corpus_id, rank AS ra FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |t AS (SELECT query_id, corpus_id, rank AS rb FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(CAST(q.embedding[1:16] AS DOUBLE[]),
        |          CAST(c.embedding[1:16] AS DOUBLE[])) DESC, c.vec_id)
        |        AS rank
        |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |w AS (SELECT f.query_id, count(*) AS n_common,
        |    sum(CASE greatest(f.ra, t.rb) WHEN 1 THEN 137 WHEN 2 THEN 77
        |      WHEN 3 THEN 47 WHEN 4 THEN 27 ELSE 12 END) AS ws
        |  FROM f JOIN t ON f.query_id = t.query_id
        |    AND f.corpus_id = t.corpus_id
        |  GROUP BY 1)
        |SELECT q.vec_id AS query_id,
        |  CAST(coalesce(w.n_common, 0) AS BIGINT) AS n_common,
        |  CAST((coalesce(w.ws, 0) * 1000000) // 300 AS BIGINT) AS ao_ppm
        |FROM q LEFT JOIN w ON w.query_id = q.vec_id
        |ORDER BY query_id""".stripMargin,

    "q_knn_label_agree" ->
      """WITH q AS (SELECT vec_id, embedding, label FROM embeddings
        |  WHERE vec_id < 500 AND vec_id % 25 = 0),
        |nb AS (SELECT query_id, corpus_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |    FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |v AS (SELECT nb.query_id, CAST(e.label AS BIGINT) AS nl,
        |    count(*) AS n
        |  FROM nb JOIN embeddings e ON e.vec_id = nb.corpus_id
        |  GROUP BY 1, 2),
        |m AS (SELECT query_id, nl AS majority_label,
        |    CAST(n AS BIGINT) AS n_votes
        |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY n DESC, nl ASC) AS rn FROM v) WHERE rn = 1)
        |SELECT m.query_id, CAST(q.label AS BIGINT) AS own_label,
        |  m.majority_label, m.n_votes,
        |  m.majority_label = CAST(q.label AS BIGINT) AS agree
        |FROM m JOIN q ON q.vec_id = m.query_id
        |ORDER BY m.query_id""".stripMargin)
}
