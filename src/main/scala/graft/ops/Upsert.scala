package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE semantics without a table format): rows from
  * `updates` override same-key rows in `base`; unmatched update rows
  * insert; unmatched base rows persist.  The standard SCD-1 / CDC-apply
  * step of a curation pipeline, expressed as ONE full-outer shuffle
  * join plus a coalesce projection — no driver state, no row-at-a-time
  * merge loop.
  *
  * Scale notes: both sides shuffle once on the key.  In a periodic
  * pipeline the base side should be stored bucketed by the key
  * (`bucketBy`) so only the (small) update side shuffles per batch;
  * AQE's skew split covers hot keys.
  *
  * Preconditions: schemas must match; key columns must be non-null on
  * both sides; and `updates` must have AT MOST ONE row per key — a
  * duplicate update key would fan out matched base rows through the
  * full-outer join (real MERGE rejects multiple matches per target row
  * for the same reason).  Deduplicate the update side first
  * (e.g. keep-latest by version) if the feed can carry replays.
  */
object Upsert {

  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val others = base.columns.filterNot(keys.contains)
    val u = updates.select(
      (keys.map(col) ++
        others.map(c => col(c).as(s"__u_$c")) :+
        lit(1).as("__matched")): _*)
    base.join(u, keys, "full_outer")
      .select((keys.map(col) ++ others.map(c =>
        when(col("__matched").isNotNull, col(s"__u_$c")).otherwise(col(c)).as(c))): _*)
  }
}
