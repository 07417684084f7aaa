package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: apply a mutation batch
  * to a versioned dimension table, closing changed rows and opening new
  * versions, without ever rewriting unchanged history.
  *
  * Versioning is by integer batch number (`valid_from`, `valid_to`;
  * open rows have `valid_to = NULL`) — deterministic and engine-neutral
  * (no timestamp timezone semantics in the contract).
  *
  * Scale design: one equi shuffle on the business key joins the OPEN
  * slice of the dimension to the batch; closed history rows pass
  * through untouched (a filter, no join), so cost is
  * `open_rows + batch`, independent of accumulated history depth.
  */
object Scd2 {

  /** Apply `updates` (key, attr) at batch `version` to a dimension
    * `dim` (key, attr, valid_from, valid_to).  `updates` must carry at
    * most one row per key (dedupe upstream — e.g. keep-latest — before
    * applying; a multi-valued key would open conflicting versions).
    *
    * - key present with a DIFFERENT attr → close the open row
    *   (`valid_to = version`) and open a new one.
    * - key present with the SAME attr → untouched (no spurious version).
    * - new key → open row (`valid_from = version`).
    * - closed history → passes through verbatim.
    */
  def apply(dim: DataFrame, updates: DataFrame, version: Long): DataFrame = {
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
    val u = updates.select(col("key").as("u_key"), col("attr").as("u_attr"))
    val joined = open.join(u, col("key") === col("u_key"), "left")
    // open rows: close only when the batch carries a real change.
    // attr comparisons MUST be null-safe (<=>): with ===, a NULL attr on
    // either side makes both filters NULL→false and the open row would
    // silently vanish from the output (same reason TableDiff uses <=>)
    val stillOpen = joined
      .filter(col("u_key").isNull || (col("attr") <=> col("u_attr")))
      .select(col("key"), col("attr"), col("valid_from"), col("valid_to"))
    val nowClosed = joined
      .filter(col("u_key").isNotNull && !(col("attr") <=> col("u_attr")))
      .select(col("key"), col("attr"), col("valid_from"),
        lit(version).as("valid_to"))
    // new versions: changed keys + keys never seen before
    val openKeys = open.select(col("key").as("k"), col("attr").as("a"))
    val newVersions = u.join(openKeys, col("u_key") === col("k"), "left")
      .filter(col("k").isNull || !(col("a") <=> col("u_attr")))
      .select(col("u_key").as("key"), col("u_attr").as("attr"),
        lit(version).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    closed.unionByName(stillOpen).unionByName(nowClosed)
      .unionByName(newVersions)
  }
}
