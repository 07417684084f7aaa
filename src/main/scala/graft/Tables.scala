package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table registry over the driver-generated parquet test data.
  *
  * Mirrors the reference's catalog surface (SessionCatalog /
  * `sql/catalyst/.../catalog/SessionCatalog.scala`) at the scale we need:
  * a fixed star schema resolved by name from a scale-factor directory.
  *
  * Scale notes: every load is a plain parquet scan, so Catalyst keeps
  * predicate pushdown / column pruning / partition pruning intact — at
  * 100 TB these tables would be directories of many files and nothing
  * here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries a nanosecond-precision parquet timestamp,
    * which Spark's TimestampType (µs) cannot hold ([PARQUET_TYPE_ILLEGAL]).
    * Read it as a long and truncate ns → µs with integer division (the
    * value ~1.7e18 exceeds 2^53, so float division would corrupt it).
    * DuckDB's `CAST(ts AS TIMESTAMP)` truncates identically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` works too.
    * Idempotent per (session, dir): repeated calls from a query battery
    * skip the 10 view re-registrations (and their parquet footer reads).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registered.contains((spark, dir))) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered += ((spark, dir))
    }
  }
  private val registered = scala.collection.mutable.Set.empty[(SparkSession, String)]
}
