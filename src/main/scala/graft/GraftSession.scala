package graft

import org.apache.spark.sql.SparkSession

/** Session plumbing shared by the runtime mains (Verify/Bench) and the
  * test harness: Hive catalog support over an embedded, per-process
  * Derby metastore.
  *
  * The reference engine is a Hive-era deployment — its users scan and
  * write metastore tables (reference `sql/hive/src/main/scala/org/
  * apache/spark/sql/hive/execution/HiveTableScanExec.scala:53`,
  * `InsertIntoHiveTable.scala:66`) and its lineage layer captures the
  * catalog table as a source (`ResolveHiveRelation.scala:18`).  An
  * embedded metastore gives the same catalog surface with no external
  * service: Derby runs in-process (one embedded Derby engine can host
  * many databases, so this coexists with the JDBC gate's Derby db),
  * and a fresh per-process directory keeps concurrent JVMs (sbt test
  * vs a Bench run) from fighting over Derby's single-owner lock.
  */
object GraftSession {

  /** Add Hive support backed by a per-process temp metastore +
    * warehouse to a session builder.
    */
  def withHive(b: SparkSession.Builder): SparkSession.Builder = {
    // Metastore and warehouse live in SESSION-scoped scratch (JVM temp
    // dir by default; relocated only by an explicit SPARK_GRAFT_TMPDIR
    // — see TmpCleanup.scratchBase for why tmpfs is never the default).
    // spark.local.dir (shuffle/spill) is left at Spark's own default
    // unless the operator relocated scratch explicitly; an explicit
    // SPARK_LOCAL_DIRS always wins, matching Spark's precedence.
    val base = TmpCleanup.sessionDir("graft_hive_")
    val withLocal =
      if (sys.env.contains("SPARK_LOCAL_DIRS") ||
        TmpCleanup.scratchBase.isEmpty) b
      else b.config("spark.local.dir", TmpCleanup.sessionDir("graft_local_"))
    withLocal.config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore;create=true")
      // the library's whole extension surface (optimizer rule, planner
      // strategy, SQL function names) rides one config line
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .enableHiveSupport()
  }
}
