package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions installer for graft.
  *
  * Registers the native vector expressions (SQL-callable) and the
  * small-dimension auto-broadcast rule. Mirrors the reference's implicit
  * assumption that lookup tables (code tables, cutoff calendars —
  * /root/reference/create_view_vw_valid_collision_from_oracle.sql:2-26)
  * are tiny and never worth a shuffle.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.VectorFunctions.registerSql(e)
  }
}
