package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational battery — covers SURVEY.md §2.4 (aggregations, grouping
  * sets/rollup/cube/pivot, distinct, stats moments), §2.5 (window
  * functions and frames), §2.6 (sort/limit/top-k), §2.7 (set ops),
  * §2.9 (generators), §2.10 (typed Dataset ops).
  *
  * Reference: aggregate functions under `catalyst/expressions/aggregate/`,
  * window expressions in `catalyst/expressions/windowExpressions.scala`,
  * set-op rewrites at `optimizer/Optimizer.scala:1387-1547`, generators in
  * `catalyst/expressions/generators.scala`, typed ops in
  * `sql/core/.../execution/objects.scala`.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val queries: Map[String, Q] = Map(
    // Window: ranking family over a partition (WindowExec, one shuffle
    // on the partition key; rank/dense_rank/row_number share one frame).
    "q_window_rank" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Window: running frames + lag/lead + ntile/percent_rank/cume_dist.
    "q_window_frames" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      ord.filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Window: avg over sliding row frame (3 preceding) per supplier.
    "q_window_sliding" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").filter(col("l_suppkey") < 20)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum(dec(col("l_quantity")))
            .over(w.rowsBetween(-3, Window.currentRow)).cast("double") /
           count(lit(1)).over(w.rowsBetween(-3, Window.currentRow)))
            .as("avg_qty_4"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // RANGE frame: sum over a value-range window + percent_rank.
    "q_window_range" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders").filter(col("o_custkey") < 50)
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-50000L, 0L)
      val wRank = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ord.select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(wRange).as("n_within_50k"),
          sum(dec(col("o_totalprice"))).over(wRange).cast("double").as("sum_within_50k"),
          round(percent_rank().over(wRank), 6).as("pr"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // GROUPING SETS via rollup: subtotals + grand total with grouping().
    "q_rollup" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    "q_cube" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },

    // PIVOT (RelationalGroupedDataset.pivot with explicit values →
    // conditional aggregation; oracle uses FILTER clauses).
    "q_pivot" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .orderBy(col("l_returnflag"))
    },

    // Multi-distinct aggregate (RewriteDistinctAggregates → Expand).
    "q_agg_distinct" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Statistical moments (CentralMomentAgg / Corr / Covariance).
    "q_agg_stats" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qe"),
          // Spark's skewness is population g1; DuckDB's is the adjusted
          // sample G1 = g1 * sqrt(n(n-1))/(n-2) — align to G1 here.
          round(skewness(col("l_quantity")) *
            sqrt(count(lit(1)) * (count(lit(1)) - 1)) / (count(lit(1)) - 2), 6)
            .as("skew_qty"),
          round(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
        .orderBy(col("l_returnflag"))
    },

    // min/max/first-last-by over groups (Max/Min, MaxBy via struct trick
    // is built-in max_by in Spark 3.3+/DuckDB).
    "q_agg_minmax" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.groupBy(col("o_orderstatus"))
        .agg(min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          // Tie-break by orderkey inside the ordering scalar: price has 2dp
          // so price*1e6 + orderkey is unique and < 2^53 (exact double).
          max_by(col("o_orderkey"), col("o_totalprice") * 1000000 + col("o_orderkey")).as("argmax_order"),
          min_by(col("o_orderkey"), col("o_totalprice") * 1000000 + col("o_orderkey")).as("argmin_order"))
        .orderBy(col("o_orderstatus"))
    },

    // collect_list/collect_set surfaced deterministically via sort.
    // Array outputs are joined to strings — the driver's pandas compare
    // cannot hash raw ndarray cells.
    "q_agg_collect" -> { (s, dir) =>
      val nation = Tables.load(s, dir, "nation")
      nation.groupBy(col("n_regionkey"))
        .agg(concat_ws("|", sort_array(collect_list(col("n_name")))).as("nations"),
          concat_ws("|", sort_array(collect_set(col("n_name")))).as("nation_set"))
        .orderBy(col("n_regionkey"))
    },

    // first/last aggregates (reference `aggregate/First.scala:38`,
    // `Last.scala:38`): order-sensitive, made deterministic by
    // co-locating each group (repartition by key) and sorting within
    // partitions — EliminateSorts keeps the sort because First/Last
    // are order-dependent aggregates.  Oracle uses DuckDB's
    // ORDER-BY-in-aggregate form.
    "q_agg_first_last" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
        .groupBy(col("user_id"))
        .agg(first(col("event_type")).as("first_type"),
          last(col("event_type")).as("last_type"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // Exact percentiles (Percentile / ApproximatePercentile's exact twin).
    "q_agg_percentile" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"))
        .orderBy(col("l_returnflag"))
    },

    // Set operations: UNION ALL / INTERSECT / EXCEPT (+ ALL variants are
    // rewritten by Catalyst to semi/anti joins — Optimizer.scala:1429+).
    "q_setops" -> { (s, dir) =>
      val hiVal = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      val building = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      // Five set-op branches folded into ONE plan (cross-join of 1-row
      // aggregates) so the entry is a single action / single job — the
      // same shape as the oracle's five scalar subqueries.
      def cnt(df: org.apache.spark.sql.DataFrame, as: String) =
        df.agg(count(lit(1)).as(as))
      cnt(hiVal.union(building), "n_union_all")
        .crossJoin(cnt(hiVal.distinct().intersect(building), "n_intersect"))
        .crossJoin(cnt(hiVal.distinct().except(building), "n_except"))
        .crossJoin(cnt(hiVal.intersectAll(building), "n_intersect_all"))
        .crossJoin(cnt(hiVal.exceptAll(building), "n_except_all"))
    },

    // Distinct / dropDuplicates (ReplaceDeduplicateWithAggregate).
    "q_distinct" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Generators: explode + posexplode over a computed array (GenerateExec).
    "q_explode" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 50)
      docs.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"),
          min(col("pos")).as("min_pos"))
        .orderBy(desc("n"), asc("word"))
        .limit(30)
    },

    // Typed Dataset ops: case-class map + groupByKey/mapGroups
    // (DeserializeToObject / MapGroupsExec) — SQL-checkable semantics.
    "q_typed_mapgroups" -> { (s, dir) =>
      val s2 = s
      import s2.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .as[(String, Double, Double)]
      li.map { case (f, q, p) => (f, math.round(q * 100), math.round(p * 100)) }
        .groupByKey(_._1)
        .mapGroups { (flag, rows) =>
          var n = 0L; var qty = 0L
          rows.foreach { r => n += 1; qty += r._2 }
          (flag, n, qty)
        }
        .toDF("l_returnflag", "n", "qty_cents")
        .orderBy(col("l_returnflag"))
    },

    // Typed cogroup (reference `KeyValueGroupedDataset.scala`,
    // `objects.scala:445`): per-key streams from two Datasets zipped by
    // key.  Money is summed as rounded cents (long) so iterator order
    // inside a group can never flip a floating-point bit.
    "q_cogroup" -> { (s, dir) =>
      val s2 = s
      import s2.implicits._
      val ords = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
        .groupByKey(_._1)
      val custs = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
        .groupByKey(_._1)
      ords.cogroup(custs) { (k, os, cs) =>
        var n = 0L
        var cents = 0L
        os.foreach { o => n += 1; cents += math.round(o._2 * 100) }
        val bal = cs.buffered.headOption
          .map(c => math.round(c._2 * 100)).getOrElse(-1L)
        Iterator((k, n, cents, bal))
      }.toDF("custkey", "n_orders", "price_cents", "bal_cents")
        .orderBy(col("custkey"))
    },

    // Top-k: ORDER BY ... LIMIT → TakeOrderedAndProjectExec (no global sort).
    "q_topk" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(25)
    },

    // CASE WHEN / coalesce / nullif conditional battery.
    "q_conditional" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"))
        .groupBy(col("band"), col("status2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("band"), col("status2"))
    })

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  ntile(4) OVER w AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_sliding" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS avg_qty_4
        |FROM lineitem WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER wr AS n_within_50k,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS sum_within_50k,
        |  round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS pr
        |FROM orders WHERE o_custkey < 50
        |WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |  RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F",
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_qe,
        |  round(skewness(l_quantity), 6) AS skew_qty,
        |  round(kurtosis_pop(l_quantity), 6) AS kurt_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_minmax" ->
      """SELECT o_orderstatus, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  max_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS argmax_order,
        |  min_by(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS argmin_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_collect" ->
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), '|') AS nations,
        |  array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nation_set
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_agg_first_last" ->
      """SELECT user_id,
        |  first(event_type ORDER BY ts, event_id) AS first_type,
        |  last(event_type ORDER BY ts, event_id) AS last_type,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_cogroup" ->
      """SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
        |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(o.cents, 0) AS BIGINT) AS price_cents,
        |  CAST(coalesce(CAST(round(c.c_acctbal * 100) AS BIGINT), -1) AS BIGINT) AS bal_cents
        |FROM (SELECT o_custkey, count(*) AS n,
        |        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM orders GROUP BY o_custkey) o
        |FULL OUTER JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY custkey""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_setops" ->
      """WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
        |  bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT
        |  (SELECT count(*) FROM (SELECT o_custkey FROM hi UNION ALL SELECT c_custkey FROM bld)) AS n_union_all,
        |  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM hi INTERSECT SELECT c_custkey FROM bld)) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM hi EXCEPT SELECT c_custkey FROM bld)) AS n_except,
        |  (SELECT count(*) FROM (SELECT o_custkey FROM hi INTERSECT ALL SELECT c_custkey FROM bld)) AS n_intersect_all,
        |  (SELECT count(*) FROM (SELECT o_custkey FROM hi EXCEPT ALL SELECT c_custkey FROM bld)) AS n_except_all""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_explode" ->
      """SELECT word, count(*) AS n, min(doc_id) AS first_doc, min(pos) AS min_pos
        |FROM (
        |  SELECT doc_id, CAST(u.pos - 1 AS INT) AS pos, u.word
        |  FROM documents,
        |    LATERAL (SELECT unnest(string_split(text, ' ')) AS word,
        |                    generate_subscripts(string_split(text, ' '), 1) AS pos) u
        |  WHERE doc_id < 50)
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 30""".stripMargin,
    "q_typed_mapgroups" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "q_conditional" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS band,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2, count(*) AS n
        |FROM orders
        |GROUP BY 1, 2 ORDER BY band, status2""".stripMargin)
}
