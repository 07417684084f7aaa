package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Differential fuzz battery — seeded random query generation over the
  * Spark∩DuckDB common dialect, every generated query an oracle-checked
  * gate entry (the SQLSmith idea, aimed at the two engines' shared
  * semantics instead of crashes).
  *
  * The generator is a pure function of the seed (splitmix-style PRNG),
  * so Verify and the oracle dump always carry the SAME text.  The
  * grammar stays inside deterministic integer land on purpose: non-
  * negative integer columns, plus/times with small constants, `%`
  * on non-negatives, comparisons, IN lists, nested CASE, sum/count/
  * min/max with BIGINT casts, GROUP BY + optional HAVING, total ORDER
  * BY — no doubles, no division, no overflow (operand magnitudes are
  * bounded by construction).
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private final class Rng(seed: Long) {
    private var s = seed
    def next(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n + n) % n).toInt
    }
    def pick[A](xs: Seq[A]): A = xs(next(xs.length))
  }

  /** (table, integer columns ≥ 0, unique key for tie-breaks) */
  private val tables = Seq(
    ("nation", Seq("n_nationkey", "n_regionkey"), "n_nationkey"),
    ("supplier", Seq("s_suppkey", "s_nationkey"), "s_suppkey"),
    ("customer", Seq("c_custkey", "c_nationkey"), "c_custkey"),
    ("region", Seq("r_regionkey"), "r_regionkey"))

  private def genArith(r: Rng, cols: Seq[String], depth: Int): String =
    if (depth == 0 || r.next(3) == 0) {
      if (r.next(4) == 0) (r.next(9) + 1).toString else r.pick(cols)
    } else r.next(4) match {
      case 0 => s"(${genArith(r, cols, depth - 1)} + ${genArith(r, cols, depth - 1)})"
      case 1 => s"(${genArith(r, cols, depth - 1)} * ${r.next(5) + 1})"
      case 2 => s"(${r.pick(cols)} % ${r.next(7) + 2})"
      case _ => s"CASE WHEN ${genPred(r, cols, 0)} " +
        s"THEN ${genArith(r, cols, depth - 1)} ELSE ${r.next(5)} END"
    }

  private def genPred(r: Rng, cols: Seq[String], depth: Int): String =
    if (depth == 0 || r.next(3) == 0) r.next(3) match {
      case 0 => s"${r.pick(cols)} ${r.pick(Seq("<", "<=", ">", ">=", "="))} ${r.next(20)}"
      case 1 => s"${r.pick(cols)} IN (${Seq.fill(r.next(3) + 1)(r.next(25)).distinct.mkString(", ")})"
      case _ => s"${r.pick(cols)} % ${r.next(5) + 2} = ${r.next(2)}"
    } else r.next(3) match {
      case 0 => s"(${genPred(r, cols, depth - 1)} AND ${genPred(r, cols, depth - 1)})"
      case 1 => s"(${genPred(r, cols, depth - 1)} OR ${genPred(r, cols, depth - 1)})"
      case _ => s"NOT (${genPred(r, cols, depth - 1)})"
    }

  /** One full SELECT: filtered grouped aggregation of two generated
    * expressions with a deterministic total order.
    */
  private def genQuery(seed: Long): String = {
    val r = new Rng(seed)
    val (table, cols, key) = r.pick(tables)
    val groupExpr = s"(${r.pick(cols)} % ${r.next(5) + 2})"
    val a1 = genArith(r, cols, 2)
    val a2 = genArith(r, cols, 2)
    val pred = genPred(r, cols, 2)
    val having = if (r.next(2) == 0) "" else s"\nHAVING count(*) >= ${r.next(3)}"
    s"""SELECT $groupExpr AS g,
       |  CAST(sum($a1) AS BIGINT) AS s1,
       |  CAST(min($a2) AS BIGINT) AS m1,
       |  CAST(max($key) AS BIGINT) AS mx,
       |  count(*) AS n
       |FROM $table
       |WHERE $pred
       |GROUP BY $groupExpr$having
       |ORDER BY g""".stripMargin
  }

  /** Joinable table pairs: (left table, left cols, right table, right
    * cols, left key = right key equi condition).
    */
  private val joinPairs = Seq(
    ("nation", Seq("n_nationkey", "n_regionkey"), "region", Seq("r_regionkey"),
      "n_regionkey = r_regionkey"),
    ("supplier", Seq("s_suppkey", "s_nationkey"), "nation",
      Seq("n_nationkey", "n_regionkey"), "s_nationkey = n_nationkey"),
    ("customer", Seq("c_custkey", "c_nationkey"), "nation",
      Seq("n_nationkey", "n_regionkey"), "c_nationkey = n_nationkey"))

  /** Two-table join query: INNER or LEFT OUTER with a generated filter
    * (left-side columns only, so LEFT keeps outer semantics), grouped
    * aggregation over mixed-side expressions, and a right-side
    * `count(col)` to exercise null-skipping under outer joins.  NULLS
    * FIRST is pinned — the engines' default null order differs.
    */
  private def genJoinQuery(seed: Long): String = {
    val r = new Rng(seed)
    val (t1, cols1, t2, cols2, on) = r.pick(joinPairs)
    val joinType = r.pick(Seq("JOIN", "LEFT JOIN"))
    val all = cols1 ++ cols2
    val groupExpr = s"(${r.pick(all)} % ${r.next(4) + 2})"
    val a1 = genArith(r, all, 2)
    val a2 = genArith(r, cols1, 2)
    val pred = genPred(r, cols1, 2)
    val rcol = r.pick(cols2)
    s"""SELECT $groupExpr AS g,
       |  CAST(sum($a1) AS BIGINT) AS s1,
       |  CAST(min($a2) AS BIGINT) AS m1,
       |  count($rcol) AS nr,
       |  count(*) AS n
       |FROM $t1 $joinType $t2 ON $on
       |WHERE $pred
       |GROUP BY $groupExpr
       |ORDER BY g NULLS FIRST""".stripMargin
  }

  /** Frozen seed per slot; a slot's seed is bumped (never reused) when
    * its query returns zero rows at the gate SF — empty==empty proves
    * nothing, so every entry must select data.
    */
  private val seeds: Seq[Long] = Seq(1L, 2L, 3L, 24L, 5L, 6L, 17L, 8L, 9L, 10L)
  private val joinSeeds: Seq[Long] = Seq(31L, 32L, 33L, 34L, 45L)

  private val sql: Map[String, String] =
    seeds.zipWithIndex.map { case (s, i) =>
      f"q_fuzz_${i + 1}%02d" -> genQuery(0xD1FF00D5L * s)
    }.toMap ++
    joinSeeds.zipWithIndex.map { case (s, i) =>
      f"q_fuzzj_${i + 1}%02d" -> genJoinQuery(0xD1FF00D5L * s)
    }.toMap

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
