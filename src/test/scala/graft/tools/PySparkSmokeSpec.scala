package graft.tools

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** PySpark-driver smoke: proves the ONE §2 row graft does not
  * re-implement — Python/Pandas UDF EXECUTION (reference
  * `sql/core/.../execution/python/`: ArrowEvalPythonExec,
  * AggregateInPandasExec, WindowInPandasExec,
  * FlatMapGroupsInPandasExec) — is nevertheless fully available to
  * graft users BY CONSTRUCTION, because graft is a library on stock
  * Spark and stock Spark ships the Python exec operators.
  *
  * The smoke runs a REAL pyspark driver (subprocess, this container's
  * python3) against graft's test tables with graft's classes on the
  * driver classpath: all four Python exec operators execute with
  * plan-name asserts (Spark 4.1 names: ArrowEvalPython,
  * FlatMapGroupsInPandas, ArrowAggregatePython, ArrowWindowPython),
  * values are checked against JVM-side aggregates, and the graft DSv2
  * catalog round-trips under the Python driver including a row-level
  * UPDATE through the ReplaceData rewrite.  Script:
  * `src/test/resources/pyspark_smoke.py`.
  *
  * CANCELLED (not failed) when the container has no pyspark-capable
  * python — the library itself must never depend on one (the honest
  * asterisk in README stands: graft ships no Python runtime; Spark
  * provides it where one exists).
  */
class PySparkSmokeSpec extends AnyFunSuite {

  private def pysparkAvailable: Boolean =
    try {
      Seq("python3", "-c",
        "import pyspark, pandas, pyarrow").!(ProcessLogger(_ => ())) == 0
    } catch { case _: Throwable => false }

  test("pyspark driver runs all four Python exec operators against " +
      "graft tables + the graft DSv2 catalog (cancelled if no pyspark)") {
    assume(pysparkAvailable, "no pyspark-capable python3 in this container")
    val out = new StringBuilder
    val code = Seq("python3", "src/test/resources/pyspark_smoke.py",
        "target/scala-2.13/classes", "/root/testdata/sf0.001")
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0 && out.toString.contains("PYSPARK_SMOKE_OK"),
      s"pyspark smoke failed (exit $code):\n${out.toString.takeRight(3000)}")
  }
}
