package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Aggregation / analytical operators.
  *
  * Scale notes: every query here is a single logical regroup (one
  * shuffle), with partial aggregation handled by Catalyst's
  * HashAggregate pairs; dimension joins are explicitly broadcast.
  */
object Analytics {

  /** Grouped multi-aggregate over the fact table (TPC-H Q1 shape).
    * Flagship: pure map-side-combinable aggregation, no join, no window;
    * at 100 TB this is one scan + one 6-group shuffle.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star join: fact ⋈ orders ⋈ customer ⋈ nation ⋈ region with the
    * dimension chain broadcast (customer/nation/region are tiny relative
    * to the fact side at any scale factor), revenue per nation.
    */
  def starJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    val dim = broadcast(
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(c("c_custkey"), n("n_name"), r("r_name")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(dim, o("o_custkey") === dim("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-N rows per group via rank window (deterministic tie-break on
    * the key) — the distributed replacement for per-group sorts.
    */
  def topNPerGroup(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Top-N per group via the custom `graft_topk` bounded-heap AGGREGATE
    * (functions.BoundedTopK) instead of a window: per-group state is k
    * rows on every map task, heaps merge map-side, and only |groups|·k
    * rows cross the shuffle — no per-partition sort of the full input.
    * The struct's lexicographic order (price, then key) ranks and
    * tie-breaks deterministically.
    */
  def topKPerGroupAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKFunctions.topK(
        struct(col("o_totalprice").as("p"), col("o_orderkey").as("kk")), k).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("o_orderpriority"), (col("i") + 1).cast("long").as("rk"),
        col("s.kk").as("o_orderkey"), col("s.p").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Running per-user sum ordered by time: one window, partitioned on
    * the entity key so state never leaves an executor.
    */
  def runningUserValue(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.filter(col("user_id") < 10)
      .withColumn("running_value", round(sum(col("value")).over(w), 6))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("running_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Pivot event_type to columns with an explicit value list — the
    * explicit list keeps it to a single shuffle (no extra pass to
    * discover pivot values) and a fixed output schema.
    */
  def pivotEventTypes(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val types = Seq("click", "view", "purchase", "signup", "error")
    e.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .select(col("user_id") +: types.map(t => col(s"`$t`").as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  /** Hierarchical totals region → nation via ROLLUP. */
  def rollupAcctBal(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    val dim = broadcast(n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(n("n_nationkey"), n("n_name"), r("r_name")))
    c.join(dim, c("c_nationkey") === dim("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Exact distinct suppliers per part (count-distinct regroup). */
  def distinctSuppliersPerPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_partkey"))
  }

  /** Approximate distinct users per event type (HLL). At 100 TB the
    * exact variant needs a full dedup shuffle per group; the sketch is
    * one pass, mergeable, constant memory. Rows-only check (approx
    * results are engine-specific by design).
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** `q_approx_distinct` gate surface: the bounded-error verdict the
    * DuckDB oracle can replay. The exact distinct (recomputable in any
    * engine) rides next to `approx_ok` — |HLL++ est − exact| ≤ 5% of
    * exact, with the sketch built at rsd 0.02 so the recorded bound
    * has 2.5× headroom. The oracle predicts every column including
    * `approx_ok = true`, so a sketch drifting out of its bound is a
    * hash FAIL in the correctness artifact, not a silent skip. The
    * scale surface stays [[approxDistinctUsers]] (sketch-only, no
    * exact pass); this is its recorded-evidence twin.
    */
  def approxDistinctGate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double") <=
          lit(0.05) * col("exact_users").cast("double")).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Quartile assignment per group (NTILE): equal-frequency bucketing
    * of order values within each priority — the windowed partner of
    * the exact-percentile aggregate.
    */
  def priceQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.withColumn("quartile", ntile(4).over(w).cast("long"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("quartile"))
      .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
  }

  /** CUBE totals over two independent dimensions: every combination of
    * (status, priority) plus both marginals and the grand total in one
    * aggregation pass.
    */
  def cubeStatusPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** RANGE-frame window: per-user moving average of `value` over the
    * trailing hour of EVENT TIME (not a row count) — the frame is
    * defined on the ordering value, so sparse and bursty streams get
    * the same semantics. Ordering on epoch micros keeps the frame
    * arithmetic integral.
    */
  def hourlyMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val micros = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy(col("user_id")).orderBy(micros)
      .rangeBetween(-3600L * 1000000L, 0L)
    e.filter(col("user_id") < 10)
      .withColumn("moving_avg", round(avg(col("value")).over(w), 6))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("moving_avg"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Exact median (linear-interpolated percentile) per group. At scale
    * the one-pass mergeable alternative is `percentile_approx`; the
    * exact variant buffers per-group values and is the cross-engine-
    * checkable baseline.
    */
  def medianPricePerPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q_funnel` surface: time-bounded ordered funnel — users who
    * clicked, then purchased WITHIN SIX HOURS of their first click, then
    * signed up within six hours of that first qualifying purchase (an
    * unbounded ordered funnel is vacuous on a month of dense activity —
    * everyone eventually does everything; the window is what makes the
    * stages discriminate). Each stage is one conditional-min
    * aggregation joined back broadcast (per-user stage timestamps are
    * entity-cardinality, tiny next to events); the event table is
    * scanned once per stage and never shuffled on anything but the
    * entity key. Emits stage name + user count + conversion share.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val hour = expr("INTERVAL 6 HOUR")
    val s1 = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "purchase")
      .join(broadcast(s1), Seq("user_id"))
      .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + hour)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "signup")
      .join(broadcast(s2), Seq("user_id"))
      .filter(col("ts") >= col("t2") && col("ts") <= col("t2") + hour)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    import spark.implicits._
    val counts = Seq(
      ("1_click", s1.count()), ("2_purchase", s2.count()),
      ("3_signup", s3.count()))
    val base = counts.head._2.max(1L)
    counts.map { case (stage, n) =>
      (stage, n, BigDecimal(n.toDouble / base)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("stage", "n_users", "share")
  }

  /** `q_gap_fill` surface: per-user daily activity with MISSING DAYS
    * zero-filled — reports and training-curriculum schedules need the
    * dense grid, not the sparse fact table. The date spine is GENERATED
    * (`sequence` + explode — rows Spark creates, not reads), cross-
    * joined with the user set, then left-joined to the sparse daily
    * aggregate; the spine and user list are broadcast-sized while the
    * fact side aggregates before joining, so the grid never inflates
    * the shuffle. Days render as strings so both engines agree on
    * formatting.
    */
  def gapFillDaily(spark: SparkSession, dir: String, maxUser: Int = 10): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("user_id") < maxUser)
    val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("s"))
    val spine = e.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val users = e.select(col("user_id")).distinct()
    users.crossJoin(broadcast(spine))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("s"), lit(0.0)), 2).as("sum_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** `q_approx_quantile` surface: one-pass approximate percentiles
    * (Greenwald-Khanna via `percentile_approx`) per group — the scale
    * path next to `q_median`'s exact interpolation, which buffers each
    * group's values. GK summaries are bounded-size and merge in partial
    * aggregation, so this runs at any cardinality. Approximation ≠
    * DuckDB's exact quantile → rows-only; the spec bounds the rank
    * error against the exact answer.
    */
  def approxQuantiles(spark: SparkSession, dir: String,
      accuracy: Int = 1000): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        expr(s"percentile_approx(o_totalprice, 0.5, $accuracy)").as("p50_est"),
        expr(s"percentile_approx(o_totalprice, 0.9, $accuracy)").as("p90_est"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q_approx_quantile` gate surface: Greenwald–Khanna's contract —
    * the returned value's RANK is within ε·n of the target rank — made
    * recordable. Per group, the estimate's empirical rank
    * (count(x ≤ est)/n, one broadcast-join pass back over the data) is
    * checked against |rank − q| ≤ 0.005 (5× the nominal ε = 1/accuracy,
    * headroom for value ties at the estimate). The oracle recomputes
    * the exact group count and predicts both verdicts true, so a rank
    * excursion fails the hash gate.
    */
  def approxQuantileGate(spark: SparkSession, dir: String,
      accuracy: Int = 1000, epsCheck: Double = 0.005): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    // the estimates come through the Quantiles.auto front door's
    // EXPLICIT Sketch mode (round 12) — the approximate path a user
    // reaches is the one the oracle rank-checks; GK from one shared
    // sketch is deterministic, so this equals the two-call form
    val est = graft.operators.Quantiles.auto(o,
        "o_orderpriority", "o_totalprice", Seq(0.5, 0.9),
        mode = graft.operators.Quantiles.QuantileMode.Sketch(accuracy))
      .groupBy(col("o_orderpriority"))
      .agg(max(when(col("p") === 0.5, col("quantile"))).as("p50_est"),
        max(when(col("p") === 0.9, col("quantile"))).as("p90_est"))
    def rankOk(le: Column, n: Column, q: Double): Column =
      abs(le.cast("double") / n.cast("double") - lit(q)) <= lit(epsCheck)
    o.join(broadcast(est), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice") <= col("p50_est")).cast("long")).as("le50"),
        sum((col("o_totalprice") <= col("p90_est")).cast("long")).as("le90"))
      .select(col("o_orderpriority"), col("n_orders"),
        rankOk(col("le50"), col("n_orders"), 0.5).as("p50_rank_ok"),
        rankOk(col("le90"), col("n_orders"), 0.9).as("p90_rank_ok"))
      .orderBy(col("o_orderpriority"))
  }

  /** Gap-based sessionization in batch: a session break is a >30min gap
    * since the previous event of the same user; session id = running
    * count of breaks. lag + cumsum over one (user, time) window — the
    * batch twin of streaming.EventStream.sessionize.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_break")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("ts"), col("session_seq"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Declarative sessions (`q_session_window`): Spark's built-in
    * `session_window` in batch — per (user, session) span + aggregates,
    * no manual lag/cumsum. Semantically a session is the transitive
    * closure of events < 30min apart; the window's end is last_ts +
    * gap, so `n_events`/`sum_value` + [start, last_ts] are emitted with
    * last_ts derived as end - gap. Same single shuffle on the entity
    * key as `sessionize`; this is the surface a streaming job reuses
    * verbatim (§2.8 runs the identical expression on MemoryStream).
    */
  def sessionWindowAgg(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr(s"INTERVAL $gapMinutes MINUTES"))
          .as("session_last"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Tumbling 1-hour windows: count + sum(value) per bucket — the batch
    * twin of the streaming windowed aggregation.
    */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // NTZ cast for the same reason as ohlcBars' bar_ts
    e.groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
        .as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** lag/lead: per-user inter-event gap (µs, integral so no float
    * noise) and the type of the NEXT event — the change-detection /
    * funnel primitive. One window, one shuffle on the entity key.
    */
  def lagLeadDeltas(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val micros = unix_micros(col("ts").cast("timestamp"))
    e.filter(col("user_id") < 20)
      .withColumn("gap_us", micros - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("ts"), col("gap_us"), col("next_type"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** first_value / last_value / nth_value over the FULL partition frame
    * (unbounded both ways): each event annotated with its user's first
    * event type, last event type, and second event id.
    */
  def firstLastPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.filter(col("user_id") < 20)
      .withColumn("first_type", first(col("event_type")).over(w))
      .withColumn("last_type", last(col("event_type")).over(w))
      .withColumn("second_event_id", nth_value(col("event_id"), 2).over(w))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("first_type"), col("last_type"), col("second_event_id"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** ROWS-frame sliding window: 3-row trailing moving average per user —
    * the row-count twin of the event-time RANGE frame above.
    */
  def movingAvgRows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, 0)
    e.filter(col("user_id") < 10)
      .withColumn("moving_avg3", round(avg(col("value")).over(w), 6))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("moving_avg3"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Relative-rank windows: percent_rank + cume_dist of order value
    * within each priority (ties share a rank, so the output is
    * deterministic without a tie-break).
    */
  def percentRanks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    o.withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("pr"), col("cd"))
      .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
  }

  /** Window standardization: z-score of each order's value against its
    * priority group's mean/stddev — whole-partition frame, no ordering,
    * so Catalyst evaluates both aggregates in one window pass.
    */
  def zscorePerPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
    o.withColumn("z",
        round((col("o_totalprice") - avg(col("o_totalprice")).over(w)) /
          stddev_samp(col("o_totalprice")).over(w), 6))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("z"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Second-moment aggregates per group: stddev / variance of order
    * value, correlation and covariance of value vs order age — all
    * partial-aggregation-friendly (merged moment sketches, one
    * shuffle).
    */
  /** Weekly cohort retention matrix (`q_retention_cohort`): users are
    * cohorted by the week of their first event; each later event lands
    * in a (cohort_week, weeks_since) cell counted by distinct users —
    * the standard retention triangle. Two shuffles, both shrunk by
    * partial aggregation: the first-event min per user, then the
    * cell-level distinct count. The per-user first-event frame joins
    * back on user_id — co-partitioned with the event shuffle, and at
    * 100 TB the user dimension is orders of magnitude smaller than the
    * event log.
    */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val firsts = e.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_wk"))
    e.select(col("user_id"), col("ts"))
      .join(firsts, Seq("user_id"))
      .select(col("user_id"), col("cohort_wk"),
        floor(datediff(to_date(col("ts")), col("cohort_wk")) / 7).cast("long").as("wk_n"))
      .groupBy(col("cohort_wk"), col("wk_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("wk_n"), col("n_users"))
      .orderBy(col("cohort_week"), col("wk_n"))
  }

  /** Cohort lifetime value (`q_cohort_ltv`): the monetary twin of
    * `q_retention_cohort` — same weekly-cohort spine, but the readout
    * is each cohort's value curve: per (cohort, age) the active users,
    * that week's value, and the CUMULATIVE value-to-date. Week values
    * round to cents BEFORE the running sum (the q_yoy discipline), so
    * the short, window-ordered cumsum adds identical numbers in both
    * engines. The running window partitions by cohort and is bounded
    * by calendar length, never data volume.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val firsts = e.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_wk"))
    val weekly = e.select(col("user_id"), col("ts"), col("value"))
      .join(firsts, Seq("user_id"))
      .select(col("user_id"), col("cohort_wk"),
        floor(datediff(to_date(col("ts")), col("cohort_wk")) / 7).cast("long").as("wk_n"),
        col("value"))
      .groupBy(col("cohort_wk"), col("wk_n"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        round(sum(col("value")), 2).as("week_value"))
    val w = Window.partitionBy(col("cohort_wk")).orderBy(col("wk_n"))
    weekly
      .withColumn("cum_value", round(sum(col("week_value")).over(w), 2))
      .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("wk_n"), col("n_active"), col("week_value"), col("cum_value"))
      .orderBy(col("cohort_week"), col("wk_n"))
  }

  /** Rate-limit / debounce pass (`q_throttle`): keep an event only if
    * the previous event with the same (user, type) is at least an hour
    * older — the batch twin of streaming dropDuplicatesWithinWatermark
    * with a time bound instead of exact equality. One lag window over
    * the natural (user, type) partitioning; the gap is compared in
    * integral microseconds so the predicate is exact.
    */
  def throttleEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
      .filter(col("prev_us").isNull ||
        unix_micros(col("ts").cast("timestamp")) - col("prev_us") >= 3600L * 1000000L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Shannon entropy of each event type's hour-of-day profile
    * (`q_entropy`): H = ln(n) - (1/n)·Σ c·ln(c) over the 24 hourly
    * counts — a uniformity diagnostic (bots spike one hour, organic
    * traffic spreads). All counting is integral and map-side
    * combinable; the only floating math is the ≤24-term Σ c·ln(c),
    * rounded at the edge.
    */
  def hourlyEntropy(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val cells = e.groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_hours"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col("event_type"), col("n"), col("n_hours"),
        round(log(col("n").cast("double")) - col("clnc") / col("n").cast("double"), 6)
          .as("entropy"))
      .orderBy(col("event_type"))
  }

  /** Mergeable distinct-count rollup (`q_hll_rollup`, rows-only): the
    * per-(priority, month) HLL sketches are built once, STORED-shaped
    * (binary, re-aggregable), and the per-priority total comes from
    * hll_union_agg over the monthly sketches — never re-scanning the
    * raw rows. This is the 100 TB pattern approx_count_distinct can't
    * express: its estimate is terminal, while sketches compose —
    * daily → monthly → yearly rollups each reuse the previous layer.
    * The exact distinct runs beside it only to report the error.
    */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val monthly = o.groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = monthly.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_custs"),
        count(lit(1)).as("n_months"))
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
    merged.join(exact, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_months"),
        col("est_custs").cast("long").as("est_custs"), col("exact_custs"),
        round(abs(col("est_custs") - col("exact_custs")).cast("double") /
          col("exact_custs").cast("double"), 4).as("rel_err"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q_hll_rollup` gate surface: [[hllRollup]]'s error report
    * collapsed to the oracle-replayable verdict — month count and
    * exact distinct are recomputed by DuckDB, and `approx_ok` asserts
    * the merged-sketch estimate is within 5% of exact (Spark's HLL
    * sketch defaults to lgK=12 ≈ 1.6% rsd, so 5% is ≥3σ headroom).
    * The sketch build + hll_union_agg merge stay load-bearing: a
    * broken merge shows up as `approx_ok = false` → hash FAIL.
    */
  def hllRollupGate(spark: SparkSession, dir: String): DataFrame =
    hllRollup(spark, dir)
      .select(col("o_orderpriority"), col("n_months"), col("exact_custs"),
        (col("rel_err") <= 0.05).as("approx_ok"))
      .orderBy(col("o_orderpriority"))

  /** Sketch-algebra audience overlap (`q_hll_intersect`, *rows-only*):
    * |A∩B| estimated by inclusion–exclusion over MERGEABLE HLL
    * sketches — est(A) + est(B) − est(A∪B) — for every event-type
    * pair. The pre-built per-type sketches are KB-sized, so the pair
    * stage is a broadcast self-join of sketches, NOT a re-scan of the
    * fact table per pair: the overlap matrix over any number of
    * segments costs one corpus pass total. Exact intersections ride
    * along; the spec bounds the relative error.
    */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val sk = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_n")).cache()
    val pairs = sk.select(col("event_type").as("t_a"), col("sk").as("sk_a"),
        col("exact_n").as("exact_a"))
      .join(sk.select(col("event_type").as("t_b"), col("sk").as("sk_b"),
        col("exact_n").as("exact_b")), col("t_a") < col("t_b"))
    val est = pairs
      .withColumn("est_a", hll_sketch_estimate(col("sk_a")))
      .withColumn("est_b", hll_sketch_estimate(col("sk_b")))
      .withColumn("est_union", hll_sketch_estimate(
        hll_union(col("sk_a"), col("sk_b"))))
      .withColumn("est_inter",
        col("est_a") + col("est_b") - col("est_union"))
    val exactInter = e.select(col("event_type").as("t_a"), col("user_id"))
      .distinct()
      .join(e.select(col("event_type").as("t_b"), col("user_id")).distinct(),
        Seq("user_id"))
      .filter(col("t_a") < col("t_b"))
      .groupBy(col("t_a"), col("t_b"))
      .agg(count(lit(1)).as("exact_inter"))
    // LEFT join: a disjoint pair has no exactInter row but its sketch
    // estimate is still a data point — the overlap matrix must show it
    // (exact 0, est possibly nonzero) rather than silently omit it.
    est.join(exactInter, Seq("t_a", "t_b"), "left")
      .select(col("t_a"), col("t_b"),
        col("est_inter").cast("long").as("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        col("est_union").cast("long").as("est_union"),
        (col("exact_a") + col("exact_b") -
          coalesce(col("exact_inter"), lit(0L))).as("exact_union"))
      .orderBy(col("t_a"), col("t_b"))
  }

  /** `q_hll_intersect` gate surface: the inclusion–exclusion overlap
    * matrix with its error bound recorded. IE's absolute error scales
    * with the UNION terms (three ~1.6%-rsd sketches), not the possibly
    * tiny intersection, so the verdict is union-relative:
    * |est∩ − exact∩| ≤ 5% of exact∪. DuckDB recomputes both exact
    * sides (pairwise distinct-user intersection/union) and predicts
    * `inter_ok = true`; a sketch-algebra regression is a hash FAIL.
    */
  def hllIntersectGate(spark: SparkSession, dir: String): DataFrame =
    hllIntersect(spark, dir)
      .select(col("t_a"), col("t_b"), col("exact_inter"), col("exact_union"),
        (abs(col("est_inter") - col("exact_inter")).cast("double") <=
          lit(0.05) * col("exact_union").cast("double")).as("inter_ok"))
      .orderBy(col("t_a"), col("t_b"))

  def statsPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val days = datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("double")
    o.select(col("o_orderpriority"), col("o_totalprice"), days.as("age_days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
        // variance/covariance are ~1e10/1e6-scale: divide by 1e6 BEFORE
        // rounding so the cross-engine float noise (relative ~1e-14)
        // sits far below the rounding boundary.
        round(var_samp(col("o_totalprice")) / 1e6, 4).as("var_price_m"),
        round(corr(col("o_totalprice"), col("age_days")), 6).as("corr_price_age"),
        round(covar_samp(col("o_totalprice"), col("age_days")) / 1e6, 6).as("cov_price_age_m"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Hourly OHLC bars per user (`q_ohlc`): open/close via `min_by`/
    * `max_by` on the unique (ts, event_id) struct — two combinable
    * aggregates instead of a rank window, so the whole bar table is
    * ONE shuffle on (user, hour) with map-side partials. Open/close
    * are pass-through parquet doubles (no arithmetic → no rounding
    * needed for cross-engine agreement); only the volume sum rounds.
    * Reference analog: the per-key latest-row idiom of
    * create_view_vw_valid_collision_from_oracle.sql:59-107, densified
    * into a time-bucketed market-data shape.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // date_trunc returns session-TZ TimestampType even for an NTZ
    // input; keep the engine's NTZ convention (identical instants
    // under the UTC session, and the parquet the gate writes reads
    // back as plain TIMESTAMP rather than TIMESTAMPTZ)
    e.select(col("user_id"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bar_ts"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("bar_ts"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"),
        round(sum(col("value")), 2).as("turnover"))
      .orderBy(col("user_id"), col("bar_ts"))
  }

  /** Per-user time-weighted average value (`q_time_weighted`): each
    * event's value is weighted by the µs gap to the NEXT event (lead
    * window), so irregular sampling doesn't bias toward bursts. Gaps
    * are integral µs longs (exact sum); the single division + round
    * happens at the edge. One window + one aggregate = two shuffles on
    * the same user_id key — Catalyst reuses the partitioning, so the
    * events table physically shuffles once.
    */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("dt_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("span_us"),
        round(sum(col("value") * col("dt_us").cast("double")) /
          sum(col("dt_us")).cast("double"), 6).as("twa_value"))
      .orderBy(col("user_id"))
  }

  /** Last-observation-carried-forward (`q_locf`): every event carries
    * the most recent purchase value at-or-before it for the same user
    * — `last(…, ignoreNulls)` over a running rows frame, the
    * imputation twin of the as-of join (no second table needed when
    * the observations live in the same stream). The carried value is
    * a pass-through parquet double — no rounding. Deterministic: the
    * (ts, event_id) ordering is unique.
    */
  def locfFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_purchase_value",
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("last_purchase_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Peak concurrency via sweep-line (`q_concurrency`): treat each
    * event as a 30-minute session and find, per event type, the peak
    * number of simultaneously-open sessions and when it first occurs.
    * The scalable shape: boundaries are AGGREGATED to a minute grid
    * first (one combinable shuffle: +starts, −ends per minute), and
    * the running sum then scans the bounded grid (minutes in the time
    * range — thousands of rows regardless of event volume), never the
    * raw boundary stream. Peak selection is an integral argmax with an
    * earliest-minute tie-break.
    */
  def peakConcurrency(spark: SparkSession, dir: String,
      sessionMin: Int = 30): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val starts = e.select(col("event_type"),
      date_trunc("minute", col("ts")).as("m"), lit(1L).as("delta"))
    val ends = e.select(col("event_type"),
      date_trunc("minute", col("ts") + expr(s"INTERVAL $sessionMin MINUTES")).as("m"),
      lit(-1L).as("delta"))
    val grid = starts.unionAll(ends)
      .groupBy(col("event_type"), col("m"))
      .agg(sum(col("delta")).as("d"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("open", sum(col("d")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("open")).as("peak"),
        min_by(col("m"), struct((-col("open")).as("neg"), col("m"))).as("peak_at"))
      .select(col("event_type"), col("peak"),
        date_format(col("peak_at"), "yyyy-MM-dd HH:mm").as("peak_at"))
      .orderBy(col("event_type"))
  }

  /** Ratio-to-report (`q_pct_of_total`): each (status, priority)
    * cell's share of its status total — the percent-of-total window
    * runs over the ALREADY-AGGREGATED frame (|status|×|priority|
    * rows), so the window sort is free at any fact size; the fact
    * table contributes one partial-agg shuffle only. Share rounds at
    * the edge.
    */
  def pctOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val cell = o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("sum_price"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("o_orderstatus"))
    cell.withColumn("status_total", sum(col("sum_price")).over(w))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("sum_price"), col("n_orders"),
        round(col("sum_price") / col("status_total"), 6).as("share"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Cumulative distinct users by day (`q_cume_users`): running
    * count-distinct rewritten as first-seen-day + running sum — each
    * user contributes once (min event day, one agg shuffle), the
    * cumsum window then runs over the per-DAY frame (≤ a few thousand
    * rows at any corpus size). The naive form — count(DISTINCT user)
    * OVER (ORDER BY day) — holds a growing distinct set per row and
    * cannot distribute.
    */
  def cumeUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val firstDay = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d"))
    val perDay = firstDay.groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cume_users", sum(col("new_users")).over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("new_users"), col("cume_users"))
      .orderBy(col("d"))
  }

  /** Median absolute deviation per group (`q_mad`): the robust spread
    * statistic — median of |x − median(x)|, two exact-percentile
    * aggregations with the per-group medians joined back broadcast
    * (group count is tiny; the fact table shuffles twice on the same
    * key). The scale path swaps `percentile` for `percentile_approx`
    * exactly as q_median ↔ q_approx_quantile.
    */
  def madPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val med = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("m"))
    o.join(broadcast(med), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(round(max(col("m")), 4).as("median_price"),
        round(expr("percentile(abs(o_totalprice - m), 0.5)"), 4).as("mad_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Event-type transition matrix (`q_transition_matrix`): Markov
    * counts and probabilities over consecutive same-user events (lag
    * via lead window, one shuffle), then count per (from, to) with the
    * per-from normalizer computed as an aggregate-of-aggregates JOIN —
    * the matrix is |types|² rows, so the second regroup is free at any
    * corpus size. All counting integral; the single probability
    * division rounds at the edge.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cnt = e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    cnt.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from").cast("double"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** PageRank over the event-type transition graph (`q_pagerank`):
    * the canonical iterative join–aggregate — each of the 3 unrolled
    * iterations is ONE co-partitioned join of the edge table with the
    * current rank vector plus ONE groupBy(to) sum, exactly the shape
    * an entity-graph ranking runs at scale (edges partitioned by src,
    * ranks re-keyed per iteration; no driver-side loop state beyond
    * the loop counter — every iteration stays a DataFrame). Simplified
    * damping form without dangling-mass redistribution; the oracle
    * unrolls the same three iterations as chained CTEs. Literals are
    * written as the exact decimals 0.85 / 0.15 on BOTH engines (1−d
    * computed in floating point would differ in the last ulp).
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val outd = edges.groupBy(col("from_type")).agg(sum(col("n")).as("n_out"))
    val p = edges.join(outd, Seq("from_type"))
      .select(col("from_type"), col("to_type"),
        (col("n").cast("double") / col("n_out").cast("double")).as("w"))
      .cache()
    val nodes = e.select(col("event_type").as("node")).distinct()
    val nn = nodes.agg(count(lit(1)).cast("double").as("nn"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("nn")).as("pr"), col("nn"))
    for (_ <- 1 to iters) {
      val inflow = p
        .join(ranks.select(col("node").as("from_type"), col("pr")), Seq("from_type"))
        .groupBy(col("to_type").as("node"))
        .agg(sum(col("w") * col("pr")).as("inflow"))
      ranks = ranks.select(col("node"), col("nn"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) / col("nn") +
            lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("pr"),
          col("nn"))
    }
    ranks.select(col("node"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("node"))
  }

  /** Two-proportion z-test (`q_ab_test`): reach of each event type in
    * cohort A (even user_id) vs cohort B (odd) with the pooled-variance
    * z statistic — the experimentation primitive next to q_chi2's
    * independence cells. Everything derives from four integers per
    * type (cohort sizes broadcast from one aggregate row); the only
    * non-rational step is one sqrt, so rounding at 6 is far above the
    * noise floor. One distinct on (user, type) — never the raw event
    * volume — feeds the whole test.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val ut = e.select(col("user_id"), col("event_type"),
      (col("user_id") % 2 === 0).as("in_a")).distinct()
    val cohorts = e.select(col("user_id"),
        (col("user_id") % 2 === 0).as("in_a")).distinct()
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("nb"))
    val reach = ut.groupBy(col("event_type"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("xa"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("xb"))
    val pa = col("xa").cast("double") / col("na").cast("double")
    val pb = col("xb").cast("double") / col("nb").cast("double")
    val pp = (col("xa") + col("xb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    // z undefined at pooled reach 0 or 1 (zero variance) — NULL there.
    val zDefined = col("xa") + col("xb") > 0 &&
      col("xa") + col("xb") < col("na") + col("nb")
    reach.crossJoin(broadcast(cohorts))
      .select(col("event_type"), col("xa"), col("na"), col("xb"), col("nb"),
        round(pa, 6).as("pa"), round(pb, 6).as("pb"),
        when(zDefined, round((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("na").cast("double") +
            lit(1.0) / col("nb").cast("double"))), 6)).as("z"))
      .orderBy(col("event_type"))
  }

  /** Decile lift / gains table (`q_decile_lift`): users ranked by
    * total spend, cut into spend-deciles with the same
    * value-histogram-cumsum bucketing as q_histogram_equi (window over
    * DISTINCT spend values, never a global user sort), then per decile:
    * user count, spend share, purchase share, and lift =
    * purchase_share / user_share — the model-evaluation gains curve.
    * Shares are ratios of integral cents/counts rounded at the edge.
    */
  def decileLift(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // localCheckpoint: three consumers (value histogram, its total, and
    // the decile join) would otherwise each re-run the events scan +
    // per-user groupBy; the per-user frame is the small one to keep.
    val users = e.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("spend_c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_buys"))
      .transform(Stabilize.apply)
    val hist = users.groupBy(col("spend_c")).agg(count(lit(1)).as("c"))
    val tot = hist.agg(sum(col("c")).as("n_total"))
    val cut = Prefix.runningSum(hist, col("c"), "cum", Seq(col("spend_c").desc))
      .crossJoin(broadcast(tot))
      .select(col("spend_c"),
        ceil(col("cum") * lit(buckets.toLong) / col("n_total")).cast("long")
          .as("decile"))
    val g = users.join(cut, Seq("spend_c"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("spend_c")).as("spend_c"),
        sum(col("n_buys")).as("n_buys"))
    val totals = g.agg(sum(col("n_users")).as("tu"),
      sum(col("spend_c")).as("ts"), sum(col("n_buys")).as("tb"))
    g.crossJoin(broadcast(totals))
      .select(col("decile"), col("n_users"), col("spend_c"), col("n_buys"),
        round(col("spend_c").cast("double") / col("ts").cast("double"), 6)
          .as("spend_share"),
        round(col("n_buys").cast("double") / col("tb").cast("double"), 6)
          .as("buy_share"),
        round((col("n_buys").cast("double") / col("tb").cast("double")) /
          (col("n_users").cast("double") / col("tu").cast("double")), 6)
          .as("lift"))
      .orderBy(col("decile"))
  }

  /** Gini coefficient of user spend (`q_gini`): Lorenz-curve
    * inequality via the value-histogram closed form — for a spend
    * value v with count c at cumulative offset b, Σ rank·x over its
    * run is v·(c·b + c(c+1)/2), so the whole coefficient
    * G = (2·S1 − (n+1)·S) / (n·S) assembles from EXACT integer
    * aggregates (cents), one double division at the end. The cumulative
    * offsets come from Prefix.runningSum over the distinct-value
    * histogram — scale-safe even when spend cents are near-unique.
    */
  def giniSpend(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val users = e.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("v"))
    val hist = users.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val withBase = Prefix.runningSum(hist, col("c"), "cum", Seq(col("v")))
      .withColumn("base", col("cum") - col("c"))
      // DIV keeps the whole term in BIGINT (Column `/` would go double
      // and make the S1 sum order-sensitive); c(c+1) is always even.
      .withColumn("s1_part",
        expr("v * (c * base + (c * (c + 1)) DIV 2)"))
    withBase.agg(
        sum(col("c")).as("n_users"),
        sum(col("v") * col("c")).as("total_c"),
        sum(col("s1_part")).as("s1"))
      .select(col("n_users"), col("total_c"),
        round((lit(2L) * col("s1") - (col("n_users") + 1) * col("total_c"))
          .cast("double") /
          (col("n_users") * col("total_c")).cast("double"), 6).as("gini"))
  }

  /** Lag-1 autocorrelation of the daily series (`q_autocorr`): pairs
    * (day, day+1) joined INTEGRALLY per type, Pearson r from exact
    * BIGINT moment sums — the same bit-stable protocol as
    * q_trend_regression, no running double state. Diagnoses burst vs
    * independent traffic per event type.
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.d") === col("a.d") + 1)
      .select(col("a.event_type").as("event_type"),
        col("a.c").as("x"), col("b.c").as("y"))
    val m = pairs.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    m.select(col("event_type"), col("n").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("r1"))
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoint (`q_changepoint`): per type, the day where the
    * cumulative deviation from the series mean peaks — cusum_t =
    * prefix_sum − t·mean with the prefix sum an exact integer window
    * over the bounded daily grid, mean one exact division; the argmax
    * row is picked by a fully tie-broken (|cusum| desc, day asc)
    * rank. The standard level-shift detector for pipeline monitoring.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val cusum = daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("ps", sum(col("c")).over(w))
      .withColumn("cusum", col("ps").cast("double") -
        col("t").cast("double") * col("s").cast("double") / col("n").cast("double"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("d").asc)
    cusum.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("d").as("cp_day"),
        round(col("cusum"), 6).as("cusum"), col("n").as("n_days"))
      .orderBy(col("event_type"))
  }

  /** Exponentially weighted moving average (`q_ewma`): the recursive
    * smooth s_t = α·x_t + (1−α)·s_{t−1} is a non-associative fold like
    * q_capped_balance — typed `groupByKey.mapGroups` over each type's
    * bounded daily series, same left-to-right order the DuckDB
    * list_reduce oracle replays, so the float trajectories are
    * IDENTICAL operation-for-operation (no reordering to diverge on).
    * Emits the final smooth and its gap to the last raw value — the
    * burn-in-free anomaly signal.
    */
  def ewmaDaily(spark: SparkSession, dir: String, alpha: Double = 0.3): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    daily.groupByKey(_._1)
      .mapGroups { (t, it) =>
        val series = it.toArray.sortBy(_._2)
        var s = series.head._3.toDouble
        series.tail.foreach { r => s = alpha * r._3 + (1.0 - alpha) * s }
        (t, series.length.toLong, s, series.last._3 - s)
      }
      .toDF("event_type", "n_days", "ewma", "last_gap")
      .select(col("event_type"), col("n_days"),
        round(col("ewma"), 6).as("ewma"), round(col("last_gap"), 6).as("last_gap"))
      .orderBy(col("event_type"))
  }

  /** Benford first-digit audit (`q_benford`): observed share of each
    * leading digit of o_totalprice against Benford's log10(1+1/d)
    * expectation with the per-digit chi² contribution — the
    * fraud/synthetic-data screen. Digit extraction is pure string
    * logic on the integral cents (no float log bucketing), counts are
    * one combinable aggregation over a 9-value domain.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val digit = substring(floor(col("o_totalprice") * 100).cast("long")
      .cast("string"), 1, 1)
    val counts = o.select(digit.as("digit"))
      .filter(col("digit") =!= "0")
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    // ln-ratio (not a log10 builtin) and explicit squaring: both
    // engines then run the identical IEEE op sequence.
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    val dev = col("observed") - col("expected")
    counts.crossJoin(broadcast(tot))
      .withColumn("observed", col("n").cast("double") / col("total").cast("double"))
      .withColumn("expected", expected)
      .select(col("digit"), col("n"),
        round(col("observed"), 6).as("observed"),
        round(col("expected"), 6).as("expected"),
        round(dev * dev / col("expected") *
          col("total").cast("double"), 6).as("chi2_contrib"))
      .orderBy(col("digit"))
  }

  /** Seasonal-naive backtest (`q_backtest`): forecast(d) = actual
    * (d−7), scored over every day with a week-old ancestor — the
    * minimum honest baseline any forecasting pipeline must beat, and
    * the backtest JOIN shape (series self-joined at lag k) used to
    * score real models at scale. MAE/bias from exact integer sums;
    * MAPE's per-term ratios are the only doubles and round at the
    * edge.
    */
  def backtestNaive(spark: SparkSession, dir: String, lagDays: Int = 7): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
    val scored = daily.as("a")
      .join(daily.as("f"),
        col("a.event_type") === col("f.event_type") &&
          col("f.d") === col("a.d") - lagDays)
      .select(col("a.event_type").as("event_type"),
        col("a.c").as("actual"), col("f.c").as("forecast"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("actual") - col("forecast"))).as("sae"),
        sum(col("actual") - col("forecast")).as("sbias"),
        sum(abs(col("actual") - col("forecast")).cast("double") /
          col("actual").cast("double")).as("sape"))
      .select(col("event_type"), col("n_eval"),
        round(col("sae").cast("double") / col("n_eval").cast("double"), 6).as("mae"),
        round(col("sbias").cast("double") / col("n_eval").cast("double"), 6).as("bias"),
        round(col("sape") / col("n_eval").cast("double"), 6).as("mape"))
      .orderBy(col("event_type"))
  }

  /** DAU / WAU stickiness (`q_dau_wau`): rolling 7-day distinct users
    * per day WITHOUT a rolling count-distinct window (which Spark
    * can't express and would hold per-day user sets in state anyway):
    * the distinct (user, day) table range-joins the bounded day grid
    * ([d−6, d] containment), then one exact distinct per grid day.
    * Join volume is |user-days|·7 — linear in activity, never
    * events². The stickiness ratio is the growth metric every
    * engagement dashboard carries.
    */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val ud = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .cache()
    val days = ud.select(col("day").as("d")).distinct()
    val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
    val wau = days.join(ud,
        col("day") <= col("d") && col("day") >= date_sub(col("d"), 6))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** Price elasticity (`q_elasticity`): OLS of ln(quantity) on
    * ln(price) across the part domain — demand curve slope per brand.
    * Aggregates first (qty/revenue per part, one shuffle), logs taken
    * once per part row; the double moment sums round at 6 (same
    * protocol as hourlyEntropy — values O(10), noise O(1e-15)).
    */
  def elasticity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("double").as("qty"),
        (sum(col("l_extendedprice")) / sum(col("l_quantity"))).as("unit_price"))
      .join(broadcast(p.select(col("p_partkey").as("l_partkey"), col("p_brand"))),
        Seq("l_partkey"))
      .select(col("p_brand"), log(col("qty")).as("ly"),
        log(col("unit_price")).as("lx"))
    val m = perPart.groupBy(col("p_brand")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum(col("lx") * col("ly")).as("sxy"),
      sum(col("lx") * col("lx")).as("sxx"))
    m.select(col("p_brand"), col("n").cast("long").as("n_parts"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("elasticity"))
      .orderBy(col("p_brand"))
  }

  /** Hour-of-day presence bitmap (`q_hour_bitmap`): each user's active
    * hours as a 24-bit mask via `bit_or(1 << hour)` — the
    * roaring-bitmap idiom in miniature: presence over a small dense
    * domain packed into ONE long per key, mergeable map-side (bit_or
    * is associative), and set cardinality read back with `bit_count`.
    * At 100 TB this replaces a count-distinct shuffle of (user, hour)
    * pairs with a single 8-byte partial per user.
    */
  def hourBitmap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.select(col("user_id"),
        expr("shiftleft(CAST(1 AS BIGINT), hour(ts))").as("bit"))
      .groupBy(col("user_id"))
      .agg(expr("bit_or(bit)").as("hour_mask"))
      .select(col("user_id"), col("hour_mask"),
        bit_count(col("hour_mask")).cast("long").as("n_active_hours"))
      .orderBy(col("user_id"))
  }

  /** Discrete percentiles per group (`q_percentile_disc`): the value
    * AT the quantile position — an actual row value, never an
    * interpolation — via one rank window + conditional aggregate.
    * The index rule mirrors DuckDB's quantile_disc exactly:
    * element at 1-based position ceil(n·p) of the sorted column
    * (probed empirically — the floor((n−1)p)+1 rule coincides on
    * most inputs but diverges at p=¾ fractional boundaries). Only p ∈ {¼, ½, ¾} are exposed: those are exact binary
    * fractions, so the (n−1)·p product is bit-identical across
    * engines (p=0.9 is NOT exact and the floor can disagree at
    * integer boundaries). Because the output is a stored value, the
    * result is bit-stable with no edge rounding at all — the property
    * interpolated percentiles (q_median) can't give.
    */
  def percentileDisc(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    val ranked = o.select(col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
    def pick(p: Double) = max(when(
      col("rn") === ceil(col("n").cast("double") * lit(p)).cast("int"),
      col("o_totalprice")))
    ranked.groupBy(col("o_orderpriority"))
      .agg(pick(0.25).as("p25_disc"), pick(0.5).as("p50_disc"),
        pick(0.75).as("p75_disc"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** IQR-fence outlier report per group (`q_outlier_iqr`): Tukey
    * fences [q1 − 1.5·IQR, q3 + 1.5·IQR] built from DISCRETE
    * quartiles (stored values — see percentileDisc), so the fence
    * arithmetic is three IEEE ops on identical inputs and every
    * outlier classification is bit-deterministic across engines;
    * interpolated quartiles would make rows near the fence flip on
    * float noise. The tiny per-group fence frame joins back broadcast;
    * the fact table is scanned twice but shuffled on the group key
    * only once per pass (both aggregations are map-side combinable).
    */
  def outlierIqr(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    val ranked = o.select(col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
    def pick(p: Double) = max(when(
      col("rn") === ceil(col("n").cast("double") * lit(p)).cast("int"),
      col("o_totalprice")))
    val fences = ranked.groupBy(col("o_orderpriority"))
      .agg(pick(0.25).as("q1"), pick(0.75).as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    o.join(broadcast(fences), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        sum(when(col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(when(col("o_totalprice") > col("hi"), col("o_totalprice"))).as("max_outlier"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Chi-squared independence cells (`q_chi2`): observed vs expected
    * counts for the status × priority contingency table. Counting is
    * integral (three map-side-combinable aggregations over the same
    * scan, regrouped on a |S|×|P| frame, so the re-joins are free);
    * expected = row_total·col_total/N and the contribution
    * (o−e)²/e are each ONE independent float expression per cell,
    * rounded at the edge — no cross-cell float summation whose order
    * could differ between engines, which is why the statistic is
    * emitted per cell rather than as a single total.
    */
  def chi2Cells(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val cell = o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("observed"))
    val rowT = cell.groupBy(col("o_orderstatus")).agg(sum(col("observed")).as("row_total"))
    val colT = cell.groupBy(col("o_orderpriority")).agg(sum(col("observed")).as("col_total"))
    val n = cell.agg(sum(col("observed")).as("grand_total"))
    cell.join(rowT, Seq("o_orderstatus"))
      .join(colT, Seq("o_orderpriority"))
      .crossJoin(broadcast(n))
      .withColumn("expected",
        col("row_total").cast("double") * col("col_total").cast("double") /
          col("grand_total").cast("double"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("observed"),
        round(col("expected"), 4).as("expected"),
        round(pow(col("observed").cast("double") - col("expected"), 2) / col("expected"), 6)
          .as("contribution"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Gaps-and-islands day streaks (`q_streaks`): consecutive active
    * days collapse to islands via the classic `day − row_number()`
    * anchor (constant within a run of consecutive dates), then one
    * aggregate per user reports streak count / longest / total active
    * days. All integral/date math — bit-stable everywhere. The window
    * runs over per-user DISTINCT days (≤ a few hundred rows per
    * partition at any corpus size), never raw events.
    */
  def dayStreaks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val days = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days.withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest"))
      .orderBy(col("user_id"))
  }

  /** Weighted median (`q_weighted_median`): per return flag, the
    * l_extendedprice at which cumulative l_quantity weight first
    * reaches half the group total. Integer weight cumsum over a
    * (price, orderkey, linenumber)-ordered window — the PICKED VALUE
    * is deterministic even where tie order isn't, because ties share
    * the value — and the reported median is a pass-through parquet
    * double (no arithmetic, no rounding). One shuffle on the group
    * key; the threshold row comes from a half-total integer compare.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val cum = li.select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("cw", sum(col("qty")).over(w))
    val tot = cum.groupBy(col("l_returnflag"))
      .agg(sum(col("qty")).as("total_w"))
    cum.join(broadcast(tot), Seq("l_returnflag"))
      .filter(col("cw") * 2 >= col("total_w"))
      .groupBy(col("l_returnflag"), col("total_w"))
      .agg(min(col("l_extendedprice")).as("weighted_median"))
      .select(col("l_returnflag"), col("total_w"), col("weighted_median"))
      .orderBy(col("l_returnflag"))
  }

  /** Interpolated percentiles (`q_percentile_cont`): Spark's exact
    * `percentile` (the (n−1)·p linear-interpolation rule DuckDB's
    * quantile_cont shares) per priority, rounded at 4 to absorb the
    * one interpolation multiply. Complements q_percentile_disc
    * (discrete) and q_approx_quantile (sketch).
    */
  def percentileCont(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val ps = o.groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("q"))
    ps.select(col("o_orderpriority"),
        round(element_at(col("q"), 1), 4).as("p25"),
        round(element_at(col("q"), 2), 4).as("p50"),
        round(element_at(col("q"), 3), 4).as("p75"))
      .orderBy(col("o_orderpriority"))
  }

  /** Equi-depth histogram (`q_histogram_equi`): ANALYZE-style decile
    * statistics WITHOUT ntile's single-partition global sort — the
    * table first collapses to a (value, count) histogram (one shuffle,
    * map-side combinable), cumulative counts come from
    * Prefix.runningSum over the distinct values (scale-safe even for a
    * continuous price domain whose distinct count tracks row count),
    * and each value's bucket is the integer ceil(cum·B/n) — so bucket
    * membership is a pure function of the value, bit-reproducible
    * under ties, and the bounds are pass-through doubles.
    */
  def equiDepthHistogram(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val hist = o.groupBy(col("o_totalprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val rs = Prefix.runningSum(hist, col("c"), "cum", Seq(col("v")))
    // n_total = the largest inclusive running total — read from the
    // (checkpointed) prefix-sum output instead of re-aggregating the
    // orders histogram, which would re-scan the table.
    val tot = rs.agg(max(col("cum")).as("n_total"))
    rs.crossJoin(broadcast(tot))
      .withColumn("bucket",
        ceil(col("cum") * lit(buckets.toLong) / col("n_total")).cast("long"))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Per-type activity trend (`q_trend_regression`): OLS of daily event
    * count against day index, computed from EXACT integer moment sums
    * (n, Σx, Σy, Σxy, Σxx, Σyy — all BIGINT, overflow-safe at these
    * magnitudes) so slope/intercept/r² are each ONE double division of
    * exact integers — bit-identical across engines, unlike
    * `regr_slope` whose internal running double sums are
    * order-sensitive. Two map-side-combinable aggregations, no window;
    * the daily-cell table is |types|·|days|, tiny at any corpus size.
    */
  def trendRegression(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val cells = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"))
      .agg(count(lit(1)).as("y"))
    val m = cells.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val dxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("event_type"), col("n").as("n_days"),
        round(dxy / dxx, 6).as("slope"),
        round((col("sy").cast("double") - (dxy / dxx) * col("sx").cast("double")) /
          col("n").cast("double"), 6).as("intercept"),
        round(dxy * dxy / (dxx * dyy), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  /** Winsorized + trimmed statistics (`q_winsor`): the robust-mean
    * complement of `q_mad`/`q_outlier_iqr` — per group, clamp values
    * into [p05, p95] (winsorize) or drop values outside it (trim) and
    * average. Two passes, both combinable: the exact percentile edges
    * per group (interpolated, the q_median protocol — bit-stable
    * cross-engine), broadcast back (|groups| rows), then one clamped
    * aggregate over the fact. avg(when(...)) ignores nulls, so the
    * trimmed mean needs no second filter pass.
    */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val edges = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.05)").as("lo"),
        expr("percentile(o_totalprice, 0.95)").as("hi"))
    o.join(broadcast(edges), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(greatest(col("lo"), least(col("hi"), col("o_totalprice")))), 4)
          .as("winsor_mean"),
        round(avg(when(col("o_totalprice").between(col("lo"), col("hi")),
          col("o_totalprice"))), 4).as("trim_mean"),
        round(first(col("lo")), 4).as("p05"),
        round(first(col("hi")), 4).as("p95"))
      .orderBy(col("o_orderpriority"))
  }

  /** Theil–Sen robust trend (`q_theil_sen`): the median of all pairwise
    * slopes per event_type over the daily activity cells — the
    * outlier-proof twin of `q_trend_regression`'s OLS on the SAME
    * cells (one corrupted day drags an OLS slope arbitrarily; the
    * median slope has a 29% breakdown point). The pair grid is
    * calendar² × |types| — 30 days → 435 pairs per type at ANY corpus
    * size, so the only O(n) stage is the map-side-combinable daily
    * rollup; the broadcast self-join and both medians run on
    * calendar-bounded frames. Every arithmetic step is bit-stable
    * cross-engine: y is an integer count, x an integer day, so each
    * slope is one IEEE division and the interpolated medians see
    * identical multisets in both engines.
    * Intercept is the standard Theil–Sen median residual
    * med(y_i − slope·x_i).
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val cells = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"))
      .agg(count(lit(1)).cast("double").as("y"))
    val b = cells.select(col("event_type").as("et2"),
      col("x").as("x2"), col("y").as("y2"))
    val slopes = cells
      .join(broadcast(b),
        col("event_type") === col("et2") && col("x") < col("x2"))
      .select(col("event_type"),
        ((col("y2") - col("y")) / (col("x2") - col("x")).cast("double")).as("slope"))
    val ms = slopes.groupBy(col("event_type"))
      .agg(expr("percentile(slope, 0.5)").as("slope"),
        count(lit(1)).as("n_pairs"))
    cells.join(broadcast(ms), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        first(col("n_pairs")).as("n_pairs"),
        round(first(col("slope")), 6).as("slope"),
        round(expr("percentile(y - slope * x, 0.5)"), 6).as("intercept"))
      .orderBy(col("event_type"))
  }

  /** Month-over-month + year-over-year revenue (`q_yoy`): aggregate
    * FIRST (one shuffle to ~tens of month rows), then the lag-1 /
    * lag-12 windows run over the tiny aggregate — the unpartitioned
    * window is bounded by calendar length, never by data volume.
    * Revenue rounds to cents before the deltas so both engines
    * difference identical numbers.
    */
  def periodRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val monthly = o.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("prev_m", lag(col("revenue"), 1).over(w))
      .withColumn("prev_y", lag(col("revenue"), 12).over(w))
      .select(col("month"), col("revenue"),
        round(col("revenue") - col("prev_m"), 2).as("mom_delta"),
        round((col("revenue") - col("prev_m")) / col("prev_m"), 6).as("mom_pct"),
        round((col("revenue") - col("prev_y")) / col("prev_y"), 6).as("yoy_pct"))
      .orderBy(col("month"))
  }

  /** Event-sequence pattern match (`q_event_pattern`): MATCH_RECOGNIZE
    * stand-in — each user-day's events collapse to an ordered
    * initial-letter string (c/e/p/s/v, deterministic (ts, event_id)
    * order inside `array_sort` on structs, no window needed), then a
    * regex detects the view→click→purchase funnel shape. One shuffle
    * on (user, day); per-group state is one day of one user's events,
    * so the collect_list is bounded regardless of corpus size.
    */
  def eventPattern(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("ch")))),
          x => x.getField("ch")), "").as("seq"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("seq"), col("seq").rlike("v.*c.*p").cast("int").as("funnel_hit"))
      .orderBy(col("user_id"), col("day"))
  }

  /** TPC-H Q3 shape (`q_ship_priority`): segment-filtered customer ⋈
    * date-bounded orders ⋈ shipped-after lineitem, revenue per order,
    * top 10. The classic selective multi-join: every filter lands
    * BEFORE its join (the segment predicate and both date predicates
    * push to the parquet scans), the fact⋈fact join shuffles only the
    * filtered slice, and the final top-10 plans as
    * TakeOrderedAndProject — no global sort. Revenue is summed in
    * exact DECIMAL and emitted as integral cents (the q_decimal_agg
    * cross-engine protocol). The filtered one-column customer key set
    * is orders of magnitude under the fact tables; AQE picks the
    * broadcast at runtime rather than a hardcoded hint (at 100 TB the
    * segment slice may exceed the driver budget, and the shuffle-hash
    * fallback is the right plan there).
    */
  def shipPriority(spark: SparkSession, dir: String, cutoff: String = "1997-06-01"): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.load(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) < to_date(lit(cutoff)))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) > to_date(lit(cutoff)))
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))).as("rev"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("decimal(18,2)").as("r2"))
      .select(col("o_orderkey"),
        (col("r2") * 100).cast("long").as("revenue_cents"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (`q_region_volume`): revenue per nation where the
    * ordering customer and the supplying supplier share a nation, one
    * region, one order year. The snowflake pattern: region→nation is a
    * broadcast chain, customer/supplier shrink to (key, nationkey)
    * pairs before touching facts, and the c_nationkey = s_nationkey
    * equality is applied as a post-join filter on two already-joined
    * small columns. Decimal-cents revenue (q_decimal_agg protocol).
    */
  def regionVolume(spark: SparkSession, dir: String, region: String = "ASIA",
      year0: String = "1996-01-01", year1: String = "1997-01-01"): DataFrame = {
    val nk = Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")
        .filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nk), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nk.select(col("n_nationkey").as("sn_key"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.load(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= to_date(lit(year0)) &&
        to_date(col("o_orderdate")) < to_date(lit(year1)))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))).as("rev"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("decimal(18,2)").as("r2"),
        count(lit(1)).as("n_items"))
      .select(col("n_name"), (col("r2") * 100).cast("long").as("revenue_cents"),
        col("n_items"))
      .orderBy(col("n_name"))
  }

  /** BFS shortest hops over the event-type transition graph
    * (`q_shortest_path`): the reachability twin of q_pagerank — start
    * from 'click', relax dist(v) = min(dist(v), dist(u)+1) over the
    * DISTINCT edge set, one co-partitioned join + groupBy-min per
    * round, frontier checkpointed so the iterative lineage stays flat
    * (the dedup_clusters discipline). The type graph is bounded, so a
    * fixed diameter cap replaces a convergence count; at entity scale
    * the same loop runs on a billion-edge table with edges hash-
    * partitioned by src. Oracle = DuckDB recursive CTE walk with the
    * same depth cap.
    */
  def shortestPath(spark: SparkSession, dir: String, source: String = "click",
      maxHops: Int = 6): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("f"), col("to_type").as("t"))
      .distinct().cache()
    var dist = Seq((source, 0L)).toDF("t", "d")
    for (_ <- 1 to maxHops) {
      val next = dist.join(edges, dist("t") === edges("f"))
        .select(edges("t").as("t"), (col("d") + 1L).as("d"))
      dist = dist.union(next)
        .groupBy(col("t")).agg(min(col("d")).as("d"))
        .transform(Stabilize.apply)
    }
    dist.select(col("t").as("event_type"), col("d").as("hops"))
      .orderBy(col("event_type"))
  }

  /** Bollinger bands (`q_bollinger`): trailing 7-row mean ± 2σ per
    * user. The sliding moments are EXACT integer window sums (values
    * floored to cents — floor, not round: double rounding ties differ
    * between engines), so the window association order can't drift;
    * mean/σ/bands are then one double expression per row written
    * identically in both engines. DuckDB's segment-tree window
    * aggregation reorders float sums — integral frames are immune.
    */
  def bollinger(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id") < 10 && col("value").isNotNull)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    val sd = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
      col("n") / lit(100.0)
    val mean = col("sx").cast("double") / col("n") / lit(100.0)
    e.withColumn("n", count(col("cents")).over(w))
      .withColumn("sx", sum(col("cents")).over(w))
      .withColumn("sxx", sum(col("cents") * col("cents")).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("n"),
        round(mean, 6).as("mid"),
        round(mean - lit(2.0) * sd, 6).as("lower"),
        round(mean + lit(2.0) * sd, 6).as("upper"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rolling exact median (`q_rolling_median`): discrete median over a
    * trailing 7-row frame — `collect_list` over the ROWS frame (state
    * bounded by the frame width, NOT the partition), `sort_array`,
    * pick position ceil(n/2). The picked value is a STORED cents value
    * (floor-cents like q_bollinger), so the result is bit-stable with
    * no float accumulation at all — the robust twin of the Bollinger
    * mean, same single window pass.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id") < 10 && col("value").isNotNull)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    e.withColumn("vals", sort_array(collect_list(col("cents")).over(w)))
      .withColumn("n", size(col("vals")).cast("long"))
      .withColumn("med_cents",
        element_at(col("vals"), expr("CAST(ceil(n / 2.0) AS INT)")))
      .select(col("user_id"), col("event_id"), col("n"), col("med_cents"),
        round(col("med_cents").cast("double") / lit(100.0), 6).as("median"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Mann–Whitney U test (`q_mwu_test`): nonparametric cohort
    * comparison (even vs odd user ids) of event values per type — the
    * rank-based complement of q_ab_test's proportion z. Midranks come
    * from the VALUE HISTOGRAM (per-(type, cents) counts + a
    * Prefix.runningSum cumsum over distinct values — never a per-row
    * rank window), and everything stays integral by carrying DOUBLED rank
    * sums: 2·midrank(v) = 2·cum_before + c_v + 1, 2·U_A = Σ a_v·2mr −
    * n_A(n_A+1). The z statistic (no tie correction; documented rule)
    * is one identical double expression.
    */
  def mwuTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"),
        (col("user_id") % 2 === 0).cast("long").as("in_a"))
    val hist = e.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"), sum(col("in_a")).as("a_v"))
    val ranked = Prefix
      .runningSum(hist, col("c"), "cum", Seq(col("cents")),
        partCols = Seq("event_type"))
      .withColumn("cum_before", col("cum") - col("c"))
      .withColumn("mr2", lit(2L) * col("cum_before") + col("c") + 1L)
    val agg = ranked.groupBy(col("event_type")).agg(
      sum(col("a_v")).as("n_a"),
      sum(col("c") - col("a_v")).as("n_b"),
      sum(col("a_v") * col("mr2")).as("r2_a"))
    // Rank sums (r2_a, u2_a) stay exact LONGs — bounded by n² per
    // group, safe to ~3e9 rows/group (upgrade to decimal(38) beyond).
    // The z-score FACTORS cast to double BEFORE multiplying: the
    // variance term n_a·n_b·(n_a+n_b+1) is cubic in group size and
    // overflowed long (ANSI error) at the 1000x soak's 100M events —
    // z is a rounded double anyway, so double factors lose nothing.
    agg
      .withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + 1L))
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        round((col("u2_a").cast("double") -
            col("n_a").cast("double") * col("n_b").cast("double")) /
          (lit(2.0) * sqrt(col("n_a").cast("double") *
            col("n_b").cast("double") *
            (col("n_a") + col("n_b") + 1L).cast("double") / lit(12.0))), 6)
          .as("z"))
      .orderBy(col("event_type"))
  }

  /** Periodicity detection (`q_period_detect`): the q_autocorr moment
    * protocol swept over lags 1..14 — the daily grid fans out through
    * a generated lag spine (one explode, volume = days×14 per type,
    * bounded by the calendar), each (type, lag) join is co-keyed on
    * (type, day+lag), and the winning lag per type is picked by a
    * fully ordered (r desc, lag asc) rank. Zero-variance lags are
    * excluded by an INTEGER predicate (denominator moments > 0), so
    * no engine-dependent NULL ordering ever reaches the rank.
    */
  def periodDetect(spark: SparkSession, dir: String, maxLag: Int = 14): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val daily = e.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .withColumn("d2", col("d") + col("lag"))
    val pairs = lagged.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("b.d") === col("a.d2"))
      .select(col("a.event_type").as("event_type"), col("a.lag").as("lag"),
        col("a.c").as("x"), col("b.c").as("y"))
    val m = pairs.groupBy(col("event_type"), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val scored = m
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0L &&
        col("n") * col("syy") - col("sy") * col("sy") > 0L)
      .withColumn("r",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("r").desc, col("lag").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("lag").as("best_lag"),
        col("n").as("n_pairs"), round(col("r"), 6).as("r"))
      .orderBy(col("event_type"))
  }

  /** Delta-encoding cost model (`q_delta_encode`): per user, the bytes
    * a zigzag-varint codec would spend on (Δts, Δcents) versus the raw
    * 16-byte fixed encoding — the storage-planning pass run before
    * committing a 100 TB time-series layout (sorted-by-user-time data
    * delta-encodes ~10×; this measures it). Everything is integer:
    * gaps in µs, values in floor-cents, zigzag via shifts, varint size
    * via an integer CASE ladder (no log/float anywhere), so the per-
    * user byte totals are bit-exact on any engine. One window (lag)
    * and one aggregation, both on the user key — a single shuffle.
    */
  def deltaEncode(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    // arithmetic zigzag (2x / −2x−1): identical on engines whose shift
    // operators disagree about negative inputs
    def zigzag(c: Column): Column =
      when(c >= 0L, c * 2L).otherwise(c * -2L - 1L)
    def varintBytes(zz: Column): Column =
      when(zz < (1L << 7), 1L).when(zz < (1L << 14), 2L)
        .when(zz < (1L << 21), 3L).when(zz < (1L << 28), 4L)
        .when(zz < (1L << 35), 5L).when(zz < (1L << 42), 6L)
        .when(zz < (1L << 49), 7L).when(zz < (1L << 56), 8L)
        .when(zz < Long.MaxValue, 9L).otherwise(10L)
    val deltas = e
      .withColumn("dts", col("us") - coalesce(lag(col("us"), 1).over(w), col("us")))
      .withColumn("dv", col("cents") -
        coalesce(lag(col("cents"), 1).over(w), lit(0L)))
      .withColumn("zts", zigzag(col("dts")))
      .withColumn("zv", zigzag(col("dv")))
    deltas.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        (count(lit(1)) * 16L).as("raw_bytes"),
        sum(varintBytes(col("zts")) + varintBytes(col("zv"))).as("delta_bytes"))
      .select(col("user_id"), col("n_events"), col("raw_bytes"), col("delta_bytes"),
        round(col("raw_bytes").cast("double") / col("delta_bytes").cast("double"), 6)
          .as("ratio"))
      .orderBy(col("user_id"))
  }

  /** Time-to-convert quartiles (`q_time_to_convert`): per user, the
    * latency from FIRST click to the first purchase after it, then
    * DISCRETE quartiles of the latency distribution — the
    * conversion-latency report every funnel owner asks for. Latencies
    * are integral µs; quartiles are stored values picked at ceil(n·p)
    * over the latency histogram's Prefix.runningSum cumsum (the
    * percentileDisc rule), so the whole report is bit-stable and never
    * single-partition even with near-unique µs latencies.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val firstClick = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    // localCheckpoint: the latency frame feeds both the histogram and
    // the broadcast total — one events join instead of two.
    val conv = e.filter(col("event_type") === "purchase")
      .join(firstClick, Seq("user_id"))
      .filter(col("us") >= col("click_us"))
      .groupBy(col("user_id"))
      .agg((min(col("us")) - min(col("click_us"))).as("lat_us"))
      .transform(Stabilize.apply)
    val hist = conv.groupBy(col("lat_us")).agg(count(lit(1)).as("c"))
    val ranked = Prefix.runningSum(hist, col("c"), "cum", Seq(col("lat_us")))
      .crossJoin(broadcast(conv.agg(count(lit(1)).as("n"))))
    def pick(p: Double) = min(when(
      col("cum") >= ceil(col("n").cast("double") * lit(p)).cast("long"),
      col("lat_us")))
    ranked.agg(max(col("n")).as("n_converted"),
        pick(0.25).as("q1_us"), pick(0.5).as("med_us"), pick(0.75).as("q3_us"))
      .select(col("n_converted"), col("q1_us"), col("med_us"), col("q3_us"))
  }

  /** Typed-Aggregator stats (`q_typed_agg`): per-user value stats
    * through the Encoder-backed `Aggregator` API registered with
    * `udaf()` (see RangeStatsAggregator) — associative integer state,
    * so Catalyst plans the same partial/final HashAggregate pair as a
    * built-in; the all-BIGINT output is oracle-exact.
    */
  def typedAgg(spark: SparkSession, dir: String): DataFrame = {
    val stats = udaf(graft.functions.RangeStatsAggregator)
    val e = Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull && col("user_id") < 50)
      .select(col("user_id"), floor(col("value") * 100).cast("long").as("cents"))
    e.groupBy(col("user_id"))
      .agg(stats(col("cents")).as("s"))
      .select(col("user_id"), col("s.n").as("n"),
        col("s.sum_cents").as("sum_cents"), col("s.min_cents").as("min_cents"),
        col("s.max_cents").as("max_cents"))
      .orderBy(col("user_id"))
  }

  /** Activity heat grid (`q_heat_grid`): hour-of-day × ISO-weekday
    * event counts with each cell's share of its weekday — the
    * timing-profile matrix behind every usage heatmap. The domain is
    * fixed (24×7), so the aggregate is one combinable shuffle and the
    * per-dow normalizer joins back broadcast; integral counting, one
    * identically-written share division per cell.
    */
  def heatGrid(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(expr("weekday(to_date(ts)) + 1").cast("long").as("dow"),
        hour(col("ts").cast("timestamp")).cast("long").as("hr"))
    val cells = e.groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("n"))
    val byDow = cells.groupBy(col("dow")).agg(sum(col("n")).as("n_dow"))
    cells.join(broadcast(byDow), Seq("dow"))
      .select(col("dow"), col("hr"), col("n"),
        round(col("n").cast("double") / col("n_dow").cast("double"), 6)
          .as("dow_share"))
      .orderBy(col("dow"), col("hr"))
  }

  /** Cascading rollup pyramid (`q_rollup_cascade`): minute → hour →
    * day, each level aggregated FROM THE LEVEL BELOW — the
    * re-aggregability contract every metrics store depends on (store
    * minutes once, answer hours/days without rescanning raw events).
    * Counts and integral cents re-sum exactly, so the cascade is
    * provably identical to aggregating raw data straight to days —
    * which is exactly what the oracle does. Emits the day level keyed
    * by type.
    */
  def rollupCascade(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("value").isNotNull)
    val minutes = e.groupBy(col("event_type"),
        date_trunc("minute", col("ts").cast("timestamp")).as("m"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    val hours = minutes.groupBy(col("event_type"),
        date_trunc("hour", col("m")).as("h"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
    hours.groupBy(col("event_type"),
        date_format(date_trunc("day", col("h")), "yyyy-MM-dd").as("day"))
      .agg(sum(col("n")).as("n_events"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Population stability index (`q_psi`): the data-drift monitor —
    * spend-decile distribution of even-key orders (reference) vs
    * odd-key orders (current), PSI contribution per bucket. Bucket
    * edges are DISCRETE value-histogram deciles of the reference
    * population (the q_rfm cut rule — stored values, bit-stable);
    * counts are integral, and each bucket's (p−q)·ln(p/q) is ONE
    * identically-written float expression (the q_chi2 no-cross-bucket
    * -sum protocol — the reader sums 10 rows if they want the scalar).
    */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    // ONE orders scan builds a per-population value histogram; every
    // downstream step (decile edges, bucket counts, population totals)
    // aggregates the histogram, never the table — the old formulation
    // re-scanned orders five times. The histogram is checkpointed: four
    // consumers, and at 100 TB it is the already-reduced frame.
    val hist2 = Tables.load(spark, dir, "orders")
      .select((col("o_orderkey") % 2 === 0).as("is_ref"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("is_ref"), col("cents")).agg(count(lit(1)).as("c"))
      .transform(Stabilize.apply)
    val refHist = hist2.filter(col("is_ref")).select(col("cents"), col("c"))
    // reference decile edges from the value histogram cumsum — the
    // two-phase prefix sum (cents is a near-unique continuous domain,
    // so a bare Window.orderBy would be a single-task cumsum), then
    // ONE conditional aggregate picks all nine edges in a single pass.
    // ONE population-totals frame (nr, nc) serves the edge rule (its n
    // IS nr) and the final shares — the old shape ran three separate
    // one-row aggregates over the ref/cur splits (round 16, guide §2.3:
    // aggregate once, reuse the broadcast).
    val totals = hist2.groupBy().agg(
      sum(when(col("is_ref"), col("c"))).as("nr"),
      sum(when(!col("is_ref"), col("c"))).as("nc"))
    val hist = Prefix.runningSum(refHist, col("c"), "cum", Seq(col("cents")))
      .crossJoin(broadcast(totals.select(col("nr").as("n"))))
    val edgeExprs = (1 to 9).map { d =>
      min(when(col("cum") >= ceil(col("n").cast("double") * lit(d / 10.0))
        .cast("long"), col("cents"))).as(s"e$d")
    }
    val edgeRow = hist.agg(edgeExprs.head, edgeExprs.tail: _*)
    val es = edgeRow.select(array((1 to 9).map(d =>
      struct(lit(d).as("d"), col(s"e$d").as("edge"))): _*).as("es"))
    // ONE bucketing pass over the two-population histogram with
    // conditional sums — the old shape bucketed ref and cur in two
    // separate groupBy exchanges and FULL-OUTER-joined them back;
    // conditional aggregation produces the identical bucket rows
    // (a bucket present in either population appears, the missing
    // side's sum is null → filled 0) in one exchange and no join.
    val pq = hist2
      .crossJoin(broadcast(es))
      .withColumn("bucket",
        aggregate(col("es"), lit(0L),
          (acc, e) => when(col("cents") >= e.getField("edge"), e.getField("d")
            .cast("long")).otherwise(acc)))
      .groupBy(col("bucket")).agg(
        sum(when(col("is_ref"), col("c"))).as("n_ref"),
        sum(when(!col("is_ref"), col("c"))).as("n_cur"))
    pq.na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round((col("n_ref").cast("double") / col("nr") -
          col("n_cur").cast("double") / col("nc")) *
          log((col("n_ref").cast("double") / col("nr")) /
            (col("n_cur").cast("double") / col("nc"))), 6).as("psi_term"))
      .orderBy(col("bucket"))
  }

  /** Holt double exponential smoothing (`q_holt`): level + trend —
    * the forecasting step up from q_ewma's single smooth. Doubly
    * non-associative, so it runs as a per-type typed `mapGroups` fold
    * over the day-sorted series; the oracle replays the SAME
    * recurrence as a DuckDB RECURSIVE CTE walking the indexed series
    * (a third deterministic-sequential-oracle technique next to
    * list_reduce and unrolled CTEs). α=0.5, β=0.25 written as
    * identical literals with (1.0 − α) COMPUTED on both engines
    * (the q_ewma ulp rule). Init: l₁ = x₁, b₁ = x₂ − x₁.
    */
  def holt(spark: SparkSession, dir: String,
      alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    daily.groupByKey(_._1)
      .flatMapGroups { (t, it) =>
        val xs = it.toArray.sortBy(_._2).map(_._3.toDouble)
        // The trend init b₁ = x₂ − x₁ needs two points; a one-point
        // series is omitted, matching the oracle CTE whose base case
        // starts at i=2 and so never emits such groups.
        if (xs.length < 2) Iterator.empty
        else {
          var l = xs(0)
          var b = xs(1) - xs(0)
          var i = 1
          while (i < xs.length) {
            val x = xs(i)
            val lNew = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (lNew - l) + (1.0 - beta) * b
            l = lNew
            i += 1
          }
          Iterator.single((t, xs.length.toLong, l, b, l + b))
        }
      }
      .toDF("event_type", "n_days", "level", "trend", "forecast")
      .select(col("event_type"), col("n_days"), round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"), round(col("forecast"), 6).as("forecast"))
      .orderBy(col("event_type"))
  }

  /** New vs returning users per day (`q_new_returning`): the product
    * health split — per day, how many active users are seen for the
    * FIRST time. First-seen day is one combinable min-aggregate over
    * the distinct (user, day) table (the q_cume_users rewrite of
    * running count-distinct); the split is then an integral per-day
    * count. Two shuffles total, both map-side combinable.
    */
  def newReturning(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val firstSeen = ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    ud.join(firstSeen, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum((col("day") === col("first_day")).cast("long")).as("n_new"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("n_new"), (col("dau") - col("n_new")).as("n_returning"),
        round(col("n_new").cast("double") / col("dau").cast("double"), 6)
          .as("new_share"))
      .orderBy(col("day"))
  }

  /** Day-of-week seasonality index (`q_seasonality_dow`): per event
    * type, the average events-per-day on each weekday relative to the
    * type's overall daily average. All counting is integral — per-type
    * daily counts (one combinable shuffle on a bounded (type, day)
    * domain), weekday-slot day counts from the DISTINCT day table —
    * and the index is one double expression (sd/dd)/(st/dt) written
    * identically in both engines, rounded at the edge. Monday-based
    * ISO weekday (Spark weekday()+1 == DuckDB isodow).
    */
  def seasonalityDow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", expr("weekday(day) + 1").cast("long"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("cnt")).as("sd"))
    val byType = daily.groupBy(col("event_type")).agg(sum(col("cnt")).as("st"))
    val days = e.select(col("day")).distinct()
      .withColumn("dow", expr("weekday(day) + 1").cast("long"))
    val dowDays = days.groupBy(col("dow")).agg(count(lit(1)).as("dd"))
    val totDays = days.agg(count(lit(1)).as("dt"))
    byDow.join(broadcast(dowDays), Seq("dow"))
      .join(broadcast(byType), Seq("event_type"))
      .crossJoin(broadcast(totDays))
      .select(col("event_type"), col("dow"), col("sd").as("n_events"),
        round((col("sd").cast("double") / col("dd")) /
          (col("st").cast("double") / col("dt")), 6).as("seasonality"))
      .orderBy(col("event_type"), col("dow"))
  }
}
