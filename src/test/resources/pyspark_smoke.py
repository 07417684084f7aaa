# PySpark-driver smoke for the graft library (run by PySparkSmokeSpec).
#
# graft is a LIBRARY on stock Spark, so Python/Pandas UDF execution --
# the reference's sql/core/.../execution/python/ surface -- is provided
# by Spark itself and available to every graft user by construction.
# This script proves it END-TO-END in this container: all four Python
# exec operators run (plan-asserted) against graft's test tables, and
# the graft DSv2 catalog (including a row-level UPDATE through the
# ReplaceData rewrite) works under a PYTHON driver.
#
# Usage: python3 pyspark_smoke.py <graft-classes-dir> <sf-dir>
import sys
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType
import pandas as pd

classes = sys.argv[1]
sf = sys.argv[2]

spark = (SparkSession.builder
    .master("local[2]")
    .appName("graft-pyspark-smoke")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())

def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()

nation = spark.read.parquet(f"{sf}/nation.parquet")

# (a) scalar pandas UDF -> ArrowEvalPythonExec
@pandas_udf(LongType())
def py_double(k: pd.Series) -> pd.Series:
    return k * 2 + 1

sel = nation.select(F.col("n_nationkey"), py_double("n_nationkey").alias("d"))
assert "ArrowEvalPython" in plan_of(sel), plan_of(sel)[:400]
got = sel.orderBy("n_nationkey").collect()
assert all(r.d == r.n_nationkey * 2 + 1 for r in got), "pandas_udf wrong"

# (b) grouped applyInPandas -> FlatMapGroupsInPandasExec
def region_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"n_regionkey": [pdf.n_regionkey.iloc[0]],
                         "n": [len(pdf)],
                         "key_sum": [int(pdf.n_nationkey.sum())]})

gdf = (nation.groupBy("n_regionkey")
       .applyInPandas(region_stats, "n_regionkey long, n long, key_sum long"))
assert "FlatMapGroupsInPandas" in plan_of(gdf), plan_of(gdf)[:400]
gs = gdf.orderBy("n_regionkey").collect()
exp = {r.n_regionkey: (r.n, r.key_sum) for r in
       nation.groupBy("n_regionkey")
       .agg(F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").alias("key_sum")).collect()}
assert all(exp[r.n_regionkey] == (r.n, r.key_sum) for r in gs), \
    "applyInPandas wrong"

# (c) grouped-agg pandas UDF -> AggregateInPandasExec (Spark 4.1: ArrowAggregatePython)
@pandas_udf(LongType())
def py_sum(v: pd.Series) -> int:
    return int(v.sum())

adf = nation.groupBy("n_regionkey").agg(py_sum("n_nationkey").alias("s"))
ap = plan_of(adf)
assert "AggregateInPandas" in ap or "ArrowAggregatePython" in ap, ap[:400]
ga = adf.orderBy("n_regionkey").collect()
assert all(exp[r.n_regionkey][1] == r.s for r in ga), "pandas agg UDF wrong"

# (d) pandas UDF over a window -> WindowInPandasExec (Spark 4.1: ArrowWindowPython)
w = Window.partitionBy("n_regionkey")
wdf = nation.select(F.col("n_regionkey"), F.col("n_nationkey"),
                    py_sum("n_nationkey").over(w).alias("ws"))
wp = plan_of(wdf)
assert "WindowInPandas" in wp or "ArrowWindowPython" in wp, wp[:400]
wg = wdf.orderBy("n_nationkey").collect()
assert all(exp[r.n_regionkey][1] == r.ws for r in wg), "WindowInPandas wrong"

# (e) the graft library under the PYTHON driver: DSv2 catalog round-trip
# including a row-level UPDATE (ReplaceData rewrite on the v2 catalog)
spark.conf.set("spark.sql.catalog.pysmoke_cat", "graft.sources.MemCatalog")
spark.sql("CREATE NAMESPACE IF NOT EXISTS pysmoke_cat.ns")
spark.sql("DROP TABLE IF EXISTS pysmoke_cat.ns.t")
spark.sql("CREATE TABLE pysmoke_cat.ns.t (k BIGINT, v STRING)")
spark.sql("INSERT INTO pysmoke_cat.ns.t VALUES (1, 'a'), (2, 'b')")
spark.sql("UPDATE pysmoke_cat.ns.t SET v = 'z' WHERE k = 2")
rows = spark.sql("SELECT k, v FROM pysmoke_cat.ns.t ORDER BY k").collect()
assert [(r.k, r.v) for r in rows] == [(1, 'a'), (2, 'z')], rows

print("PYSPARK_SMOKE_OK")
spark.stop()
