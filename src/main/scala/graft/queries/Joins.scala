package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Join battery — covers SURVEY.md §2.3 (inner/outer/semi/anti/cross,
  * broadcast vs shuffle strategies) with TPC-H-shaped multi-way joins.
  *
  * Reference join surface: `catalyst/plans/joinTypes.scala` (Inner:60,
  * LeftOuter:70, FullOuter:78, LeftSemi:82, LeftAnti:86, Cross:65) and the
  * physical operators under `sql/core/.../execution/joins/`.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer/part)
  * are broadcast — at 100 TB the fact tables (lineitem/orders) never
  * shuffle for these joins; only fact⋈fact joins (orders⋈lineitem) go
  * through a shuffle on the join key, which AQE can re-plan.  Every
  * aggregate runs partial→final so the shuffle carries combined rows.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def t(s: String): Column = lit(s).cast("timestamp")

  val queries: Map[String, Q] = Map(
    // Q3 shape: fact⋈fact⋈dim with top-k (TakeOrderedAndProject).
    "q03_shipping_priority" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders").filter(col("o_orderdate") < t("1995-03-15"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > t("1995-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // Q5 shape: 6-way star join, all dims broadcast.
    "q05_local_supplier" -> { (s, dir) =>
      val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.load(s, dir, "nation")
      val supp = Tables.load(s, dir, "supplier")
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= t("1996-01-01") && col("o_orderdate") < t("1997-01-01"))
      val li = Tables.load(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // Q10 shape: returned-item revenue per customer, top 20.
    "q10_returned_items" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= t("1996-10-01") && col("o_orderdate") < t("1997-01-01"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    // Q13 shape: LEFT OUTER join + two-level aggregate (distribution).
    "q13_customer_distribution" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // LEFT SEMI: customers that placed at least one high-value order.
    "q_join_semi" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI: customers with no HIGH-VALUE order (every customer
    // has some order in this data, so anti-joining all orders would be
    // an empty -- and therefore toothless -- gate).
    "q_join_anti" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // FULL OUTER with null-side handling.
    "q_join_full_outer" -> { (s, dir) =>
      val supp = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      val cust = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      supp.join(cust, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy(col("nationkey"))
    },

    // SHUFFLED HASH JOIN, forced by hint (plan asserted in PlanSpec):
    // both sides hash-partition on the key, no sort — the build side is
    // per-partition hashed, not broadcast.
    "q_join_shuffle_hash" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders").hint("SHUFFLE_HASH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty_sum"))
        .orderBy(col("o_orderpriority"))
    },

    // CROSS join (CartesianProduct / BroadcastNestedLoop on small inputs).
    "q_join_cross" -> { (s, dir) =>
      val region = Tables.load(s, dir, "region")
      val nation = Tables.load(s, dir, "nation")
      region.crossJoin(nation)
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("r_name"))
    },

    // Non-equi theta join (BroadcastNestedLoop): price-band matching.
    "q_join_theta" -> { (s, dir) =>
      val part = Tables.load(s, dir, "part").filter(col("p_size") === 1)
      val supp = Tables.load(s, dir, "supplier")
      supp.join(broadcast(part),
          col("s_acctbal") > col("p_retailprice") / lit(100))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("s_suppkey"))
    },

    // Q18 shape: groupBy-HAVING then join back to facts (large orders).
    "q18_large_orders" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      ord.join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(50)
    })

  val oracle: Map[String, String] = Map(
    "q03_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q05_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_join_full_outer" ->
      """SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
        |  coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |FULL OUTER JOIN
        |  (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_join_shuffle_hash" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, count(*) AS n_pairs
        |FROM region CROSS JOIN nation
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_theta" ->
      """SELECT s_suppkey, count(*) AS n_parts
        |FROM supplier JOIN part ON s_acctbal > p_retailprice / 100
        |WHERE p_size = 1
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders JOIN (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150) big
        |ON o_orderkey = big.l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 50""".stripMargin)
}
