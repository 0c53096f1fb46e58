package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's analytical heart, re-expressed Spark-first: which
  * entities were in a "valid" state as of a bucket-dependent cutoff
  * date (/root/reference/create_view_vw_valid_collision_from_oracle.sql).
  *
  * Reference shape: 7 CTEs — inline cutoff calendar, min(created) per
  * collision, year extraction, calendar join, two ROW_NUMBER passes and
  * two redundant re-filters to find the latest status at/before the
  * cutoff, then a status-whitelist filter and a left join back to the
  * entity table.
  *
  * Spark shape: ONE broadcast join (calendar is constant-sized) + ONE
  * aggregation + ONE window — three stages, two shuffles on the same
  * key (user_id), no re-ranking passes. At 100 TB the status history is
  * the big table; everything per-entity stays in one partition through
  * the agg→window chain because both hash on user_id.
  *
  * Domain mapping: collision → user, status history → events,
  * coll_status_type_id → event_type, "valid" statuses {220,221} →
  * {"purchase","signup"}, collisions table → customer.
  */
object Validity {

  /** Inline cutoff calendar: first-activity week-of-January → cutoff
    * timestamp (mirrors the year→cutoff CTE at sql:2-26, which is an
    * irregular hand-maintained calendar, hence literals not a formula).
    */
  val cutoffs: Seq[(Int, String)] = Seq(
    1 -> "2024-01-21 00:00:00",
    2 -> "2024-01-25 00:00:00",
    3 -> "2024-01-28 00:00:00",
    4 -> "2024-01-31 00:00:00",
    5 -> "2024-02-04 00:00:00")

  def cutoffTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cutoffs.toDF("wk", "cutoff_str")
      .select(col("wk"),
        to_timestamp(col("cutoff_str")).as("cutoff_ts"))
  }

  /** Earliest event per user + its week bucket (CollisionEarliestDate +
    * CollisionCaseYear, sql:27-47, fused into one aggregate).
    */
  def firstEvent(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .withColumn("wk", ceil(dayofmonth(col("first_ts")) / lit(7.0)).cast("int"))

  /** Latest event at-or-before each user's cutoff: the reference's three
    * ROW_NUMBER/filter passes (sql:59-107) collapse to one descending
    * row_number with a deterministic tie-break, after broadcasting the
    * cutoff calendar onto the per-user week bucket.
    */
  def statusAtCutoff(spark: SparkSession, events: DataFrame): DataFrame = {
    val withCutoff = firstEvent(events)
      .join(broadcast(cutoffTable(spark)), "wk")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .join(withCutoff, "user_id")
      .filter(col("ts") <= col("cutoff_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("wk"), col("cutoff_ts"),
        col("event_type").as("last_type"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"))
  }

  /** Valid entities (the view's Option 2, sql:142-152): status at cutoff
    * in the whitelist, joined to the entity table, non-null name,
    * ordered name-desc like the reference's case_nbr DESC.
    */
  def validUsers(spark: SparkSession, events: DataFrame, customer: DataFrame): DataFrame =
    statusAtCutoff(spark, events)
      .filter(col("last_type").isin("purchase", "signup"))
      .join(customer, col("user_id") === customer("c_custkey"), "left")
      .filter(col("c_name").isNotNull)
      .select(col("user_id"), col("c_name"))
      .orderBy(col("c_name").desc, col("user_id"))

  def validUsersFromDir(spark: SparkSession, dir: String): DataFrame =
    validUsers(spark,
      Tables.load(spark, dir, "events"),
      Tables.load(spark, dir, "customer"))

  /** `q_min_per_key` surface: earliest event per user + week bucket. */
  def firstEventQuery(spark: SparkSession, dir: String): DataFrame =
    firstEvent(Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("first_ts"), col("wk"))
      .orderBy(col("user_id"))

  /** `q_cutoff_lookup_join` surface: per-user cutoff assignment via the
    * broadcast calendar join.
    */
  def cutoffAssignments(spark: SparkSession, dir: String): DataFrame =
    firstEvent(Tables.load(spark, dir, "events"))
      .join(broadcast(cutoffTable(spark)), "wk")
      .select(col("user_id"), col("wk"), col("first_ts"), col("cutoff_ts"))
      .orderBy(col("user_id"))

  /** `q_latest_at_cutoff` surface. */
  def statusAtCutoffQuery(spark: SparkSession, dir: String): DataFrame =
    statusAtCutoff(spark, Tables.load(spark, dir, "events"))
      .orderBy(col("user_id"))
}
