package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal join operators Spark has no single built-in for: as-of
  * joins and range joins.
  *
  * The as-of join generalizes the reference's "latest status at-or-
  * before the cutoff" (create_view_vw_valid_collision_from_oracle.sql:
  * 59-107): instead of three ROW_NUMBER passes over a pair join, both
  * sides are unioned into one keyed stream and a single running
  * `last(ignoreNulls)` window carries the most recent right-side row
  * forward — ONE shuffle on the key, no pairwise blowup, linear in
  * |left|+|right| at any scale.
  */
object Temporal {

  /** Generic as-of join: for every left row, attach the latest right
    * row with the same key whose timestamp is <= the left timestamp.
    * `payload` columns are carried from the right side (prefixed
    * `asof_`). Right rows sort before left rows on timestamp ties, so
    * an exactly-simultaneous right row matches (inclusive as-of).
    *
    * When several right rows share the same (key, timestamp), the one
    * with the greatest `tieBreak` payload column wins — without it the
    * attached payload would depend on partition layout (nulls-first
    * ascending ordering puts the max tie value last under the running
    * `last()`, and left rows carry a null tie so they never reorder
    * against right rows).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTs)).withColumn("__is_l", lit(1))
    val rTagged = right
      .select((key +: rightTs +: payload).map(col): _*)
      .withColumnsRenamed(payload.map(p => p -> s"asof_$p").toMap)
      .withColumn("__t", col(rightTs)).withColumn("__is_l", lit(0))
      .drop(rightTs)
    val tieCols = tieBreak.map(t => col(s"asof_$t").asc_nulls_first).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc +: col("__is_l").asc +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(
      lTagged.unionByName(rTagged, allowMissingColumns = true)) {
      case (df, p) =>
        df.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_l") === 1).drop("__t", "__is_l")
  }

  /** `q_asof_join` surface: each purchase event joined to the user's
    * latest prior (or simultaneous) click. The click side is first
    * deduplicated to one row per (user_id, ts) keeping the max
    * event_id — DuckDB's ASOF JOIN (the oracle) picks arbitrarily
    * among equal-timestamp matches, so both engines must see a
    * tie-free right side to agree bit-for-bit.
    */
  def purchaseAsOfClick(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    asOfJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_event_id", "click_ts"), tieBreak = Some("click_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_event_id").as("click_event_id"),
        col("asof_click_ts").as("click_ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** `q_asof_native` surface: the same purchase↔click as-of join, but
    * through the CUSTOM operator (graft.plans.AsOfJoin logical node →
    * AsOfJoinStrategy → AsOfJoinExec streaming merge) instead of the
    * union+window formulation — one shuffle+sort per side and O(1)
    * merge state per partition. Same oracle as q_asof_join.
    */
  def purchaseAsOfClickNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("click_event_id"))
    graft.plans.AsOfJoinOps
      .asOfJoinNative(spark, purchases, clicks,
        "user_id", "c_user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_event_id"), col("click_ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** `q_asof_broadcast` surface: the SAME purchase↔click as-of join
    * through the BROADCAST exec — clicks are dim-sized relative to a
    * fact table, so the purchase side flows from scan to output with
    * zero shuffles (the strategy's other arm; same oracle again).
    */
  def purchaseAsOfClickBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("click_event_id"))
    graft.plans.AsOfJoinOps
      .asOfJoinBroadcastNative(spark, purchases, clicks,
        "user_id", "c_user_id", "ts", "click_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_event_id"), col("click_ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Forward as-of join (`q_asof_forward`): for every left row, attach
    * the EARLIEST right row with the same key at-or-after the left
    * timestamp — purchase → next click, the attribution twin of the
    * backward as-of. Same single-shuffle union+window shape, with the
    * window running from the FUTURE side (descending time, right rows
    * after left rows on ties so an exactly-simultaneous right row
    * matches inclusively); ties on (key, ts) break on max tieBreak,
    * mirroring `asOfJoin`.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTs)).withColumn("__is_l", lit(1))
    val rTagged = right
      .select((key +: rightTs +: payload).map(col): _*)
      .withColumnsRenamed(payload.map(p => p -> s"asof_$p").toMap)
      .withColumn("__t", col(rightTs)).withColumn("__is_l", lit(0))
      .drop(rightTs)
    val tieCols = tieBreak.map(t => col(s"asof_$t").asc_nulls_first).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc +: col("__is_l").asc +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(
      lTagged.unionByName(rTagged, allowMissingColumns = true)) {
      case (df, p) =>
        df.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_l") === 1).drop("__t", "__is_l")
  }

  /** `q_asof_forward` surface: each purchase joined to the user's next
    * (or simultaneous) click — funnel continuation attribution. The
    * click side is deduplicated to one row per (user_id, ts) keeping
    * MIN event_id (the forward mirror of the backward query's max
    * rule), so both engines see a tie-free right side.
    */
  def purchaseNextClick(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    asOfJoinForward(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_event_id", "click_ts"), tieBreak = Some("click_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_event_id").as("click_event_id"),
        col("asof_click_ts").as("click_ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Nearest-event join (`q_asof_nearest`): each purchase joined to the
    * click CLOSEST in time in either direction — the "match to the
    * nearest reading" join sensor pipelines need, which neither as-of
    * direction alone gives. Composed from the two as-of operators
    * (backward + forward, each one shuffle over the same key) and an
    * equi-join to pick the closer side; |Δ| compared in integral µs,
    * ties prefer the earlier (backward) click. Both directions see the
    * same tie-free click side (min event_id per (user, ts)).
    */
  def purchaseNearestClick(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    val back = asOfJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_event_id", "click_ts"), tieBreak = Some("click_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_event_id").as("b_id"), col("asof_click_ts").as("b_ts"))
    val fwd = asOfJoinForward(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_event_id", "click_ts"), tieBreak = Some("click_event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_event_id").as("f_id"), col("asof_click_ts").as("f_ts"))
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    val dB = us(col("ts")) - us(col("b_ts"))
    val dF = us(col("f_ts")) - us(col("ts"))
    val pickB = col("f_id").isNull || (col("b_id").isNotNull && dB <= dF)
    back.join(fwd, Seq("event_id", "user_id", "ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(pickB, col("b_id")).otherwise(col("f_id")).as("near_event_id"),
        when(pickB, col("b_ts")).otherwise(col("f_ts")).as("near_ts"),
        when(pickB, dB).otherwise(dF).as("delta_us"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** SCD2 point-in-time lookup (`q_scd2_lookup`): each fact row joined
    * to the dimension VERSION valid at the fact's timestamp —
    * fact.ts ∈ [valid_from, valid_to) — the warehouse pattern behind
    * every "status as of the order date" question (and the reference's
    * status-at-cutoff chain re-expressed as a dimension join). The
    * version intervals come from one lead() window over the change
    * feed; the lookup is a broadcast non-equi join (SCD dimensions are
    * dim-sized), so the fact side is never shuffled. Interval
    * boundaries are half-open, so a fact exactly at a change instant
    * deterministically takes the NEW version, and zero-length
    * intervals (same-timestamp changes) match nothing.
    */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = e.filter(col("event_type") === "click" && col("user_id") < 20)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id").as("d_user"), col("event_id").as("status_event_id"),
        col("ts").as("valid_from"), col("valid_to"))
    val facts = e.filter(col("event_type") === "purchase" && col("user_id") < 20)
      .select(col("event_id"), col("user_id"), col("ts"))
    facts.join(broadcast(dim),
        col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("status_event_id"), col("valid_from").as("status_from"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Inline promo windows for the interval-overlap join. */
  val promoWindows: Seq[(Int, String, String)] = Seq(
    (1, "2024-01-03 06:00:00", "2024-01-05 18:00:00"),
    (2, "2024-01-10 00:00:00", "2024-01-12 00:00:00"),
    (3, "2024-01-17 12:00:00", "2024-01-21 12:00:00"),
    (4, "2024-01-26 00:00:00", "2024-01-27 06:00:00"))

  /** Interval × interval overlap join (`q_overlap_join`): each user-
    * day activity interval [first event, last event] against a small
    * promo-window calendar, keeping pairs with POSITIVE overlap and
    * emitting the overlap duration — the campaign-exposure join
    * (range join is point-in-interval; this is the two-sided
    * generalization with predicate a.start < b.end AND b.start <
    * a.end). The promo side broadcasts; the user-day intervals come
    * from one combinable min/max aggregation; overlap arithmetic is
    * integral µs.
    */
  def overlapJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promos = promoWindows.toDF("promo_id", "start_s", "end_s")
      .select(col("promo_id"),
        unix_micros(to_timestamp(col("start_s"))).as("p0"),
        unix_micros(to_timestamp(col("end_s"))).as("p1"))
    val spans = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("a0"),
        max(unix_micros(col("ts"))).as("a1"))
    spans.join(broadcast(promos),
        col("a0") < col("p1") && col("p0") < col("a1"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("promo_id").cast("long").as("promo_id"),
        (least(col("a1"), col("p1")) - greatest(col("a0"), col("p0")))
          .as("overlap_us"))
      .filter(col("overlap_us") > 0L)
      .orderBy(col("user_id"), col("day"), col("promo_id"))
  }

  /** Inline interval calendar for the range join (wk → [start, end)). */
  val weekRanges: Seq[(Int, String, String)] = Seq(
    (1, "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
    (2, "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
    (3, "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    (4, "2024-01-22 00:00:00", "2024-01-29 00:00:00"),
    (5, "2024-01-29 00:00:00", "2024-02-05 00:00:00"),
    (6, "2024-02-05 00:00:00", "2024-02-12 00:00:00"),
    (7, "2024-02-12 00:00:00", "2024-02-19 00:00:00"),
    (8, "2024-02-19 00:00:00", "2024-02-26 00:00:00"))

  /** `q_range_join` surface: assign events to calendar intervals via a
    * non-equi join against the BROADCAST range table, then count per
    * interval. The fact side is scanned once; a small range table makes
    * the nested-loop probe O(|events| × |ranges|) with |ranges| tiny —
    * the right shape whenever the interval table fits in memory.
    */
  def eventsByRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = weekRanges.toDF("wk_bucket", "start_s", "end_s")
      .select(col("wk_bucket"),
        to_timestamp(col("start_s")).as("start_ts"),
        to_timestamp(col("end_s")).as("end_ts"))
    val e = Tables.load(spark, dir, "events")
    e.join(broadcast(ranges),
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("wk_bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("wk_bucket"))
  }

  /** `q_range_join_native` surface: the SAME interval aggregation as
    * `eventsByRange`, but through the custom `IntervalJoinExec` —
    * binary-search probe of the broadcast sorted calendar instead of
    * BroadcastNestedLoopJoin's scan of every interval per row. Same
    * oracle; the plain variant stays as the composed-builtins baseline.
    */
  def eventsByRangeNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = weekRanges.toDF("wk_bucket", "start_s", "end_s")
      .select(col("wk_bucket"),
        to_timestamp(col("start_s")).as("start_ts"),
        to_timestamp(col("end_s")).as("end_ts"))
    val e = Tables.load(spark, dir, "events")
    graft.plans.IntervalJoinOps
      .intervalJoinNative(spark, e, ranges, "ts", "start_ts", "end_ts")
      .groupBy(col("wk_bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("wk_bucket"))
  }

  /** Generic skew-salted inner equi-join: the skewed (fact) side gets a
    * deterministic salt in [0, nSalt); the other side is replicated
    * nSalt times so every salted key still meets every match. Result is
    * row-identical to the plain join — the salt only splits a hot key's
    * rows across nSalt reducers. The salt hashes the caller-chosen
    * `saltCols` (a cheap, hash-safe discriminator like a line number or
    * event id), NOT rand(): retries and speculative tasks must salt
    * identically. Rows identical across `saltCols` land in one bucket,
    * so pick columns that vary within the hot key. Replication
    * multiplies the right side — use the smallest factor that levels
    * the hottest key (see `q_heavy_hitters` for the diagnostic).
    */
  def saltedJoin(facts: DataFrame, other: DataFrame,
      factKey: String, otherKey: String, nSalt: Int,
      saltCols: Seq[String]): DataFrame = {
    val f = facts.withColumn("__salt",
      pmod(hash(saltCols.map(facts(_)).toIndexedSeq: _*), lit(nSalt)))
    val o = other.withColumn("__salt",
      explode(array((0 until nSalt).map(lit): _*)))
    // Salting only means anything for a SHUFFLE join (it splits a hot
    // key across reducers); pin the strategy so a borderline size
    // estimate can't flip the replicated side into a broadcast — which
    // both defeats the salt and, at scale, broadcasts an
    // nSalt-times-replicated fact (the round-7 local-cluster soak
    // OOMed exactly there).
    f.join(o.hint("shuffle_merge"),
        f(factKey) === o(otherKey) && f("__salt") === o("__salt"))
      .drop("__salt")
  }

  /** `q_salted_join_agg` surface: the salted fact⋈fact join above,
    * aggregated — the final result provably equals the unsalted join
    * (the oracle runs the plain join; the PropertySpec proves row
    * identity on skewed random data). Salted on the line number, sized
    * to the observed skew (4); a real deploy reads the factor from
    * shuffle-partition size metrics.
    */
  def saltedJoinRevenue(spark: SparkSession, dir: String, nSalt: Int = 4): DataFrame =
    saltedJoin(
        Tables.load(spark, dir, "lineitem"),
        Tables.load(spark, dir, "orders"),
        "l_orderkey", "o_orderkey", nSalt, Seq("l_linenumber"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  /** Tolerance-bounded as-of join (`q_asof_tolerance`): the standard
    * backward as-of, but a match older than `toleranceUs` is treated
    * as NO match (both attached columns nulled) — pandas
    * merge_asof(tolerance=…) semantics. Real feeds go quiet (sensor
    * drop-outs, market halts); carrying an hours-stale tick forward is
    * worse than admitting absence. Same single-shuffle plan as
    * q_asof_join; the staleness test is an integral-µs projection on
    * top.
    */
  def purchaseAsOfClickTolerance(spark: SparkSession, dir: String,
      toleranceUs: Long = 3600L * 1000000L): DataFrame = {
    val base = purchaseAsOfClick(spark, dir)
    val fresh = unix_micros(col("ts").cast("timestamp")) -
      unix_micros(col("click_ts").cast("timestamp")) <= toleranceUs
    base.select(col("event_id"), col("user_id"), col("ts"),
        when(fresh, col("click_event_id")).as("click_event_id"),
        when(fresh, col("click_ts")).as("click_ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Interval-union coverage per user (`q_interval_union`): total time
    * covered by the union of [ts, ts+30 min) activity intervals — the
    * classic sweep: sort intervals by start within the key, carry the
    * running max end, and each interval contributes only the part past
    * everything already covered (`end − max(start, prev_max_end)`,
    * clamped at 0). Overlaps never pair-join — ONE window over ONE
    * shuffle on the key, linear at any scale, where the naive
    * formulation is an O(n²) self-join per user. A fresh block starts
    * whenever start > prev_max_end, so the merged-block count falls
    * out of the same pass. All arithmetic in integral µs — bit-stable
    * everywhere.
    */
  def intervalUnion(spark: SparkSession, dir: String,
      lenUs: Long = 1800L * 1000000L): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val iv = e.select(col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("s"),
      (unix_micros(col("ts").cast("timestamp")) + lit(lenUs)).as("en"),
      col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("prev_end", max(col("en")).over(w))
      .withColumn("covered",
        greatest(lit(0L), col("en") - greatest(col("s"), coalesce(col("prev_end"), col("s")))))
      .withColumn("new_block",
        when(col("prev_end").isNull || col("s") > col("prev_end"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("new_block")).as("n_blocks"),
        sum(col("covered")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** Marketing attribution (`q_attribution`): each purchase carries its
    * LAST-touch view (most recent prior view within the lookback) and
    * FIRST-touch view (earliest view ever before it) — both from ONE
    * window pass over the view∪purchase stream per user: running
    * `last(ignoreNulls)` / `min` of view timestamps over rows
    * preceding. No self-join, no per-pair scan; integral µs
    * arithmetic; the lookback void is a plain comparison after the
    * window. This is the forward-looking twin of the as-of family
    * re-expressed as attribution.
    */
  def attribution(spark: SparkSession, dir: String,
      lookbackUs: Long = 3L * 86400L * 1000000L): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val viewT = when(col("event_type") === "view", col("t"))
    e.withColumn("last_view", last(viewT, ignoreNulls = true).over(w))
      .withColumn("first_view", min(viewT).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("t").as("purchase_us"),
        when(col("last_view") >= col("t") - lit(lookbackUs), col("last_view"))
          .as("last_touch_us"),
        col("first_view").as("first_touch_us"))
      .orderBy(col("purchase_id"))
  }
}
