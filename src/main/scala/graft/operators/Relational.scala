package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational odds-and-ends that round out the ETL surface: explicit
  * grouping sets, set operators, deterministic arg-max, fixed-width
  * histograms, date-part derivation, and null-handling policies.
  *
  * Scale notes: every operator is a single scan plus at most one
  * shuffle; the arg-max uses an ordered-struct aggregate (map-side
  * combinable) instead of a window so no per-group sort materializes.
  */
object Relational {

  /** Explicit GROUPING SETS — each marginal without the full cube:
    * (status), (priority), and the grand total, tagged with the
    * standard grouping_id bit-encoding.
    */
  def groupingSetsTotals(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Set operators: users who both clicked AND purchased, minus anyone
    * who ever hit an error — INTERSECT/EXCEPT with their standard
    * distinct semantics (each is a hash aggregate, not a join chain).
    */
  def intersectExceptUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // user-DAY granularity: every user eventually emits every event
    // type, so user-level sets degenerate to empty/full — days with a
    // click AND a purchase but NO error are the non-trivial audit set
    def userDays(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
    userDays("click").intersect(userDays("purchase"))
      .except(userDays("error"))
      .orderBy(col("user_id"), col("d"))
  }

  /** rank vs dense_rank vs row_number side by side (`q_rank_dense`):
    * the three ranking semantics on a tied column — rank leaves gaps
    * after ties, dense_rank doesn't, row_number breaks ties (here
    * deterministically on the key). One window pass.
    */
  def rankDense(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val byPrice = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    val tieBroken = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(byPrice).cast("long").as("rnk"),
        dense_rank().over(byPrice).cast("long").as("drnk"),
        row_number().over(tieBroken).cast("long").as("rn"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Constraint audit (`q_constraint_audit`): primary-key uniqueness
    * and foreign-key integrity across the star schema, one row per
    * constraint — the data-quality gate a migration (the reference's
    * two-lineage fusion) runs before trusting joins. PK violations =
    * n_rows − n_distinct(key); FK orphans = LEFT ANTI count against
    * the parent key set. Every check is one combinable aggregation or
    * one anti-join; all counts integral.
    */
  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def t(name: String) = Tables.load(spark, dir, name)
    def pk(check: String, df: DataFrame, keys: Seq[String]) = {
      val n = df.count()
      val d = df.select(keys.map(col): _*).distinct().count()
      (check, n, n - d)
    }
    def fk(check: String, child: DataFrame, ck: String,
        parent: DataFrame, pkCol: String) = {
      val n = child.count()
      val orphans = child.select(col(ck))
        .join(parent.select(col(pkCol).as(ck)).distinct(), Seq(ck), "left_anti")
        .count()
      (check, n, orphans)
    }
    val rows = Seq(
      pk("customer_pk", t("customer"), Seq("c_custkey")),
      pk("orders_pk", t("orders"), Seq("o_orderkey")),
      pk("lineitem_pk", t("lineitem"), Seq("l_orderkey", "l_linenumber")),
      pk("part_pk", t("part"), Seq("p_partkey")),
      fk("orders_custkey_fk", t("orders"), "o_custkey", t("customer"), "c_custkey"),
      fk("lineitem_orderkey_fk", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey"),
      fk("lineitem_partkey_fk", t("lineitem"), "l_partkey", t("part"), "p_partkey"),
      fk("lineitem_suppkey_fk", t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey"),
      fk("customer_nationkey_fk", t("customer"), "c_nationkey", t("nation"), "n_nationkey"),
      fk("supplier_nationkey_fk", t("supplier"), "s_nationkey", t("nation"), "n_nationkey"),
      fk("nation_regionkey_fk", t("nation"), "n_regionkey", t("region"), "r_regionkey"))
    rows.toDF("check_name", "n_checked", "n_violations")
      .orderBy(col("check_name"))
  }

  /** Bag-semantics intersection (`q_intersect_all`): INTERSECT ALL
    * keeps min(multiplicity) per row — with q_except_all it completes
    * the bag algebra (the reconciliation question "how many of these
    * duplicated rows appear in BOTH feeds"). Same aggregate-shaped
    * plan, no pairwise join.
    */
  def intersectAllClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    def bag(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
    bag("click").intersectAll(bag("view")).orderBy(col("user_id"), col("d"))
  }

  /** Bag-semantics set difference (`q_except_all`): EXCEPT ALL keeps
    * MULTIPLICITY — a user-day with 3 clicks and 1 view survives twice
    * — which is what reconciliation of duplicated feeds needs (the
    * DISTINCT form of q_intersect_except would hide residual dup
    * counts). Spark plans `exceptAll` as a sum-of-counts aggregate +
    * generate (one shuffle), never a pairwise join.
    */
  def exceptAllClicks(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    def bag(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
    bag("click").exceptAll(bag("view")).orderBy(col("user_id"), col("d"))
  }

  /** Deterministic arg-max/arg-min per group via ordered-struct
    * aggregates: max(struct(price, key)) compares lexicographically, so
    * equal prices break ties on the key — unlike a bare max_by, which
    * picks arbitrarily. No window, no per-group sort: one combinable
    * aggregation.
    */
  def argMinMaxOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("mx"),
        min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("mn"))
      .select(col("o_orderpriority"),
        col("mx.k").as("max_order"), col("mx.p").as("max_price"),
        col("mn.k").as("min_order"), col("mn.p").as("min_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q_heavy_hitters` surface: top-k keys by row count with their
    * share of the table — the skew diagnostic run BEFORE choosing a
    * salt factor or an AQE skew threshold. One map-side-combinable
    * count per key; the top-k is a distributed TakeOrderedAndProject
    * over the aggregated key table, and the grand total joins in as a
    * broadcast single-row aggregate (no second scan of the fact).
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val perKey = l.groupBy(col("l_orderkey").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = perKey.agg(sum(col("n_rows")).as("n_total"))
    // orderBy+limit plans as TakeOrderedAndProject: each partition keeps
    // its local top-k, the driver merges k·partitions rows — no global
    // sort of the key table. The rank window then runs over k rows only.
    val topk = perKey.orderBy(col("n_rows").desc, col("key").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("key").asc)
    topk
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rk"), col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 6)
          .as("share"))
      .orderBy(col("rk"))
  }

  /** `q_cms_topk` surface: heavy-hitter counts estimated from a
    * count-min sketch next to their exact counts. The sketch is built
    * by Spark's `count_min_sketch` aggregate — fixed-size counter
    * grids summed map-side per partition, so the build is one
    * partial-aggregate pass whose shuffle payload is the SKETCH SIZE,
    * not the key cardinality: the way to count keys at 100 TB when
    * even the aggregated key table is too wide to materialize. With a
    * fixed seed the estimate is deterministic, but DuckDB has no CMS
    * to replay → rows-only; the spec asserts the CMS contract
    * (never under-counts; over-counts bounded by eps·N).
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 20,
      eps: Double = 0.0005, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    import spark.implicits._
    val l = Tables.load(spark, dir, "lineitem")
    val bytes = l.select(
        expr(s"count_min_sketch(l_orderkey, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    // Exact top-k lives on k rows (TakeOrderedAndProject) — probing the
    // driver-held sketch for k keys is metadata-sized work.
    val topk = l.groupBy(col("l_orderkey").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc).limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    topk.zipWithIndex.map { case ((key, exact), i) =>
      (i + 1L, key, exact, cms.estimateCount(key))
    }.toSeq.toDF("rk", "key", "n_exact", "n_est")
  }

  /** `q_cms_topk` gate surface: the CMS contract recorded per heavy
    * hitter. Rank/key/exact count are DuckDB-recomputable (exact top-k
    * with the same desc-count, asc-key tie-break); `cms_ok` asserts
    * never-under + over ≤ 2·eps·N (the spec's w.h.p. bound with 2×
    * slack — deterministic here: fixed seed, fixed data). The sketch
    * build and probe stay load-bearing; an under-count or an
    * out-of-bound collision is a hash FAIL in the artifact.
    */
  def cmsTopkGate(spark: SparkSession, dir: String, k: Int = 20,
      eps: Double = 0.0005): DataFrame = {
    val n = Tables.load(spark, dir, "lineitem").count()
    val bound = (2 * eps * n).toLong + 1
    cmsHeavyHitters(spark, dir, k, eps)
      .select(col("rk"), col("key"), col("n_exact"),
        (col("n_est") >= col("n_exact") &&
          col("n_est") <= col("n_exact") + lit(bound)).as("cms_ok"))
      .orderBy(col("rk"))
  }

  /** `q_bloom_prune` surface: lineitem ⋈ urgent-orders revenue with a
    * bloom filter on the urgent order keys pruning the fact scan FIRST.
    * The build is a distributed aggregate (`stat.bloomFilter`); the
    * probe (`graft.functions.BloomFunctions.mightContain`) runs inside
    * whole-stage codegen before the join. At test scale the urgent dim
    * broadcasts anyway; at 100 TB — where both sides shuffle — the
    * bloom cuts the fact side's shuffle volume to ~the matching rows
    * (plus fpp), which is the difference between shuffling 100 TB and
    * shuffling the selectivity of the predicate. False positives are
    * removed by the join itself, so the result equals the plain join
    * exactly (the oracle runs the unpruned join).
    */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val bloom = graft.functions.BloomFunctions
      .buildBytes(urgent, "o_orderkey", expectedItems = 200000L, fpp = 0.01)
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(graft.functions.BloomFunctions.mightContain(bloom, col("l_orderkey")))
    l.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("order_year"))
  }

  /** Fixed-width histogram of order values: explicit floor-binning
    * (portable across engines, unlike width_bucket) with clamped edge
    * buckets; one aggregation, bucket count bounded by the bin spec
    * regardless of data volume.
    */
  def priceHistogram(spark: SparkSession, dir: String,
      lo: Double = 0.0, width: Double = 50000.0, nBuckets: Int = 12): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val bucket = least(greatest(floor((col("o_totalprice") - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("long")
    o.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy(col("bucket"))
  }

  /** Date-part derivation suite over the order date: calendar parts,
    * month-end, day arithmetic, day-diff from an epoch — all evaluated
    * in one projection (no shuffle at all).
    */
  def datePartsOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val d = to_date(col("o_orderdate"))
    o.select(col("o_orderkey"),
        year(d).cast("long").as("yr"),
        quarter(d).cast("long").as("qtr"),
        month(d).cast("long").as("mo"),
        dayofmonth(d).cast("long").as("dom"),
        dayofweek(d).cast("long").as("dow"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("plus30"),
        datediff(d, lit("1995-01-01")).cast("long").as("age_days"))
      .orderBy(col("o_orderkey"))
  }

  /** FULL OUTER reconciliation of two lineages: keys on either side
    * survive, presence flags mark which source had them — the
    * fuse-two-databases audit query (the reference's Oracle-vs-
    * Analytics comparison generalized). Both sides derive from one
    * scan; the join shuffles on the key once.
    */
  def fullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val a = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price_a"))
    val b = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price_b"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("price_a").isNotNull, 1L).otherwise(0L).as("in_a"),
        when(col("price_b").isNotNull, 1L).otherwise(0L).as("in_b"),
        round(coalesce(col("price_a"), col("price_b")), 2).as("price"))
      .orderBy(col("k"))
  }

  /** Snapshot diff (`q_snapshot_diff`): CDC-style changed-row detection
    * between two versions of a keyed table — the incremental-ETL
    * primitive that turns full reloads into delta loads. One full-outer
    * join on the key; presence decides insert/delete, column-level
    * inequality decides update (typed comparison, NOT a stringified
    * row hash — float formatting is engine-specific but value equality
    * is not). Unchanged rows are dropped so the output is the delta,
    * which at 100 TB is what gets written, not the snapshots.
    * The two "snapshots" derive deterministically from `orders`:
    * version B drops key%5==0, adds key%3==0-only rows, and doubles
    * the price of key%7==0.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val a = o.filter(col("o_orderkey") % 3 =!= 0)
    val b = o.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
    val aa = a.select(col("o_orderkey"), col("o_totalprice").as("price_a"),
      col("o_orderstatus").as("status_a"))
    val bb = b.select(col("o_orderkey"), col("o_totalprice").as("price_b"),
      col("o_orderstatus").as("status_b"))
    aa.join(bb, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("price_a").isNull, "insert")
          .when(col("price_b").isNull, "delete")
          .when(col("price_a") =!= col("price_b") ||
            col("status_a") =!= col("status_b"), "update")
          .otherwise("same").as("change"),
        round(coalesce(col("price_b"), col("price_a")), 2).as("price"))
      .filter(col("change") =!= "same")
      .orderBy(col("o_orderkey"))
  }

  /** Array aggregation: per-user sorted distinct event-type vocabulary
    * (collect_set is order-nondeterministic — array_sort fixes the
    * output) plus its cardinality.
    */
  def collectTypesPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // The sorted set is emitted joined to one string: the harness's
    // row-sort + hash compare needs hashable (scalar) cells, and a
    // canonical delimiter-joined form is engine-neutral anyway.
    e.groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"))
  }

  /** String-function suite in one projection: case mapping, padding,
    * substring, replacement, reversal — the name/code normalization
    * pass of a schema-mapping ingest.
    */
  def stringFuncsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    c.select(col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("c_name"), "#", "-").as("name_dashed"),
        reverse(col("c_mktsegment")).as("segment_rev"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy(col("c_custkey"))
  }

  /** SCD type-2 interval build: each event opens a validity interval
    * that the user's NEXT event closes — valid_from/valid_to/is_current
    * via one lead() window per entity. The standard
    * change-data-capture → dimension-history transform.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.filter(col("user_id") < 20)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("status"),
        col("ts").as("valid_from"), col("valid_to"),
        when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** Unpivot (melt): wide order metrics to long (key, metric, value)
    * rows — the pandas `melt` the reference's profiling code leans on,
    * as a zero-shuffle projection.
    */
  def unpivotOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("o_custkey"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("o_custkey")), "metric", "val")
      .orderBy(col("o_orderkey"), col("metric"))
  }

  /** Column profiler: null count / distinct count / min / max per
    * profiled column, one output row per column (min/max rendered as
    * strings so heterogeneous columns share a schema). The per-column
    * aggregates all fold into ONE scan-side pass per column — at scale
    * this is the ingest-time data-quality report.
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    cols.map { c =>
      o.agg(
        lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
    }.reduce(_ unionByName _)
      .orderBy(col("column_name"))
  }

  /** `q_sequence_agg`: each user's event-type journey as one ordered
    * string — the session-path feature of behavior pipelines. One
    * shuffle on the key; the ordering happens INSIDE the aggregated
    * array (array_sort over (ts, event_id, type) structs), so no
    * window sort over the whole table. Ties on the µs timestamp break
    * deterministically on event_id.
    */
  def journeyPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"))
      .agg(
        concat_ws(">",
          transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("journey"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** `q_mode_per_key`: most frequent event_type per user with a
    * DETERMINISTIC tie-break (greatest type name wins) — mode() by
    * ordered-struct max, two map-side-combinable aggregations and no
    * window sort. The built-in `mode` aggregate is tie-arbitrary, so
    * it cannot be oracle-checked; this formulation can.
    */
  def modePerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("cnt"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("mode_type"),
        col("m.cnt").as("mode_n"))
      .orderBy(col("user_id"))
  }

  /** Null-handling policy: synthesize nulls (open orders lose their
    * priority; cheap orders lose their value), then repair them with
    * coalesce / fill defaults plus an nvl2-style presence flag — the
    * declarative twin of the reference's pandas fillna/notnull passes.
    */
  def nullCleanOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val prio = when(col("o_orderstatus") =!= "O", col("o_orderpriority"))
    val price = when(col("o_totalprice") >= 5000.0, col("o_totalprice"))
    o.select(col("o_orderkey"),
        coalesce(prio, lit("UNSPECIFIED")).as("priority_clean"),
        when(prio.isNull, 0L).otherwise(1L).as("priority_present"),
        round(coalesce(price, lit(0.0)), 2).as("price_filled"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-group 2-D Pareto frontier (`q_skyline`): within each order
    * priority, keep orders no other order dominates on (lower price,
    * earlier date) — the multi-objective filter behind "cheapest AND
    * freshest" candidate selection. Not O(n²): orders collapse to one
    * row per (group, price) carrying the min date, a prefix-min window
    * over that distinct-price table gives the best date among strictly
    * cheaper rows, and a row survives iff it ties its price's min date
    * and beats every cheaper price's date. One small shuffle on
    * (group, price), one window over the collapsed table, one join
    * back on the same key. Huge single groups would turn the window's
    * prefix-min into the two-phase scan used by text_batch_pack.
    */
  def paretoOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val perPrice = o.groupBy(col("o_orderpriority"), col("o_totalprice"))
      .agg(min(col("o_orderdate")).as("min_d"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice.withColumn("pre_min_d", min(col("min_d")).over(w))
    o.join(frontier, Seq("o_orderpriority", "o_totalprice"))
      // dominated ⇔ a strictly cheaper order is no later (pre_min_d
      // <= date), or a same-price order is strictly earlier (date >
      // min_d); identical (price, date) pairs never dominate each
      // other, and both survive via date == min_d.
      .filter(col("o_orderdate") <= col("min_d") &&
        (col("pre_min_d").isNull || col("pre_min_d") > col("o_orderdate")))
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Typed cogroup profile (`q_cogroup_profile`): the Dataset[T]
    * typed-API surface — orders and events co-partitioned on the
    * entity key in ONE shuffle each, then a per-key fold over BOTH
    * iterators (counts + first-activity delta) without materializing
    * either group. cogroup is the escape hatch when per-key logic
    * needs simultaneous streaming access to two inputs (full-outer
    * semantics included: keys present on one side only still emit);
    * here the fold is O(1) state, so a key's data never sits in
    * memory — the property that keeps it safe under key skew at
    * 100 TB. Equivalent SQL (two pre-aggregations + FULL OUTER join)
    * is the oracle — an independent formulation, not a replay.
    */
  def cogroupProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .as[(Long, Long)]
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long)]
    orders.groupByKey(_._1).cogroup(events.groupByKey(_._1)) { (k, os, es) =>
      var nO = 0L; var minO = Long.MaxValue
      os.foreach { o => nO += 1; if (o._2 < minO) minO = o._2 }
      var nE = 0L; var minE = Long.MaxValue
      es.foreach { e => nE += 1; if (e._2 < minE) minE = e._2 }
      val delta: Option[Long] =
        if (nO > 0 && nE > 0)
          Some(math.floor((minO - minE) / 86400000000.0).toLong)
        else None
      Iterator((k, nO, nE, delta))
    }.toDF("key", "n_orders", "n_events", "delta_days")
      .orderBy(col("key"))
  }

  /** Higher-order array-function suite (`q_array_funcs`): per-order
    * line items collected to sorted arrays, then reduced entirely with
    * codegen-friendly builtins — aggregate (fold), filter + size,
    * exists, array_max — the array-column toolkit for feature
    * engineering without a single UDF. Per-element rounding precedes
    * the max so every float op is order-independent.
    */
  def arrayFuncsOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(col("l_quantity"))).as("qtys"),
        sort_array(collect_list(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("nets"),
        sort_array(collect_list(col("l_returnflag"))).as("flags"))
      .select(col("l_orderkey"),
        size(col("qtys")).cast("long").as("n_items"),
        aggregate(col("qtys"), lit(0.0), (acc, x) => acc + x).as("qty_total"),
        size(filter(col("qtys"), x => x >= 25)).cast("long").as("n_big"),
        // integer cents at the edge: round(max·100) to a long agrees
        // bit-for-bit across engines (2dp-rounding a 4-decimal product
        // does not — HALF_UP on the exact binary vs std::round diverge
        // on knife-edge doubles)
        round(array_max(col("nets")) * 100, 0).cast("long").as("max_net_cents"),
        exists(col("flags"), f => f === "R").cast("long").as("any_return"))
      .orderBy(col("l_orderkey"))
  }

  /** Exact decimal money aggregation (`q_decimal_agg`): the whole
    * revenue computation in DECIMAL — cast once at the scan (the
    * parquet doubles hold 2dp money, so the scale-4 cast is exact far
    * beyond the double's ulp), multiply/sum in exact decimal, one
    * decimal(18,2) cast at the edge. Unlike double sums, decimal
    * aggregation is ASSOCIATIVE — bit-identical across engines,
    * partition layouts, and executor counts — which is why money
    * columns at 100 TB should be decimal end to end (the double
    * queries here stabilize by edge-rounding instead; this operator is
    * the layout-independent alternative). No rounding epsilon anywhere.
    */
  def decimalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,4)").as("p"),
        col("l_discount").cast("decimal(9,4)").as("dsc"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("p")).cast("decimal(18,2)").as("g2"),
        sum(col("p") * (lit(1).cast("decimal(9,4)") - col("dsc")))
          .cast("decimal(18,2)").as("n2"),
        count(lit(1)).as("n_items"))
      // integral cents are the bit-exact cross-engine check; the
      // doubles exist for readability (2dp decimal → double is exact
      // and identical everywhere)
      .select(col("l_returnflag"),
        (col("g2") * 100).cast("long").as("gross_cents"),
        (col("n2") * 100).cast("long").as("net_cents"),
        col("g2").cast("double").as("gross"),
        col("n2").cast("double").as("net"),
        col("n_items"))
      .orderBy(col("l_returnflag"))
  }

  /** Discrete quartile cut points of several INTEGRAL columns at once,
    * computed on a metric-tagged value histogram: counts per distinct
    * (metric, value), ONE running cumsum partitioned by metric through
    * Prefix.runningSum (range-partitioned two-phase prefix sum — even
    * a continuous metric whose distinct-value count approaches row
    * count never lands on a single task), then
    * cut(p) = min value whose cumulative count reaches position
    * ceil(n·p) — exactly DuckDB's quantile_disc rule. The per-metric
    * total is max(cum) over the checkpointed prefix output (no second
    * histogram pass), and the pivot emits one broadcastable row named
    * `<metric>_q25/_q50/_q75` — three metrics cost one prefix sum,
    * not three.
    */
  private def discCuts(df: DataFrame, metrics: Seq[String]): DataFrame = {
    val hist = metrics.map(m =>
        df.select(lit(m).as("metric"), col(m).as("v")))
      .reduce(_.unionByName(_))
      .groupBy(col("metric"), col("v")).agg(count(lit(1)).as("c"))
    val rs = Prefix.runningSum(hist, col("c"), "cum", Seq(col("v")),
      partCols = Seq("metric"))
    val n = rs.groupBy(col("metric")).agg(max(col("cum")).as("n"))
    def cut(p: Double) = min(when(
      col("cum") >= ceil(col("n").cast("double") * lit(p)), col("v")))
    rs.join(broadcast(n), Seq("metric"))
      .groupBy(col("metric"))
      .agg(cut(0.25).as("q25"), cut(0.5).as("q50"), cut(0.75).as("q75"))
      .groupBy().pivot("metric", metrics)
      .agg(first(col("q25")).as("q25"), first(col("q50")).as("q50"),
        first(col("q75")).as("q75"))
  }

  /** RFM segmentation (`q_rfm`): recency / frequency / monetary per
    * customer, each scored 1–4 against the population's discrete
    * quartiles. Monetary is summed in integral cents (float sums are
    * partition-order noise; cents are associative), recency in whole
    * days — every metric and every cut point is integral, so the
    * segment assignment is bit-deterministic across engines and
    * layouts. The three one-row cut frames broadcast into a single
    * projection; recency scores are inverted (smaller = better = 4).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val per = o.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
    val mx = per.agg(max(col("last_d")).as("corpus_max"))
    // localCheckpoint: the per-customer frame feeds FOUR consumers (the
    // final projection + three quartile-cut histograms) — without it
    // each one re-runs the orders scan + groupBy; with it the orders
    // aggregation happens once and the (much smaller) per-customer
    // frame is served from storage. No CacheManager entry, blocks
    // reclaimed by the ContextCleaner.
    val cust = per.crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("corpus_max"), col("last_d")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .transform(Stabilize.apply)
    def score(v: Column, q25: Column, q50: Column, q75: Column): Column =
      lit(1) + when(v > q25, 1).otherwise(0) + when(v > q50, 1).otherwise(0) +
        when(v > q75, 1).otherwise(0)
    cust
      .crossJoin(broadcast(discCuts(cust,
        Seq("recency_days", "frequency", "monetary_cents"))))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        (lit(5) - score(col("recency_days"), col("recency_days_q25"),
          col("recency_days_q50"), col("recency_days_q75"))).as("r_score"),
        score(col("frequency"), col("frequency_q25"),
          col("frequency_q50"), col("frequency_q75")).as("f_score"),
        score(col("monetary_cents"), col("monetary_cents_q25"),
          col("monetary_cents_q50"), col("monetary_cents_q75")).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"), col("m_score").cast("string")))
      .orderBy(col("o_custkey"))
  }

  /** Largest-remainder apportionment (`q_allocation`): split a global
    * sample budget across sources proportional to document counts —
    * floor shares first, then the leftover seats go to the largest
    * integral remainders (ties by source name). The whole computation
    * is integer arithmetic on the per-source count frame (|sources|
    * rows after ONE combinable shuffle), so quotas are exactly
    * reproducible — the property a training-mix spec depends on;
    * proportional-rounding via floats drifts between engines.
    */
  def largestRemainder(spark: SparkSession, dir: String,
      budget: Long = 1000L): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val n = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = n
      .withColumn("total", sum(col("n_docs")).over(whole))
      .withColumn("base", expr(s"(n_docs * ${budget}L) DIV total"))
      .withColumn("remainder", expr(s"(n_docs * ${budget}L) % total"))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(whole))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("remainder").desc, col("source"))))
    base.select(col("source"), col("n_docs"), col("base"), col("remainder"),
        when(col("pos") <= col("leftover"), 1L).otherwise(0L).as("extra"))
      .withColumn("alloc", col("base") + col("extra"))
      .orderBy(col("source"))
  }

  /** Journey trigram mining (`q_seq_ngrams`): the top consecutive
    * event-type triples across user sessions — two lead windows over
    * ONE per-user shuffle, integral counting, and a fully-ordered
    * top-20 (count desc, then the trigram itself) so the selection is
    * deterministic. The ORDER BY + LIMIT plans as
    * TakeOrderedAndProject: each partition keeps 20 rows, no global
    * sort materializes.
    */
  def journeyTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** Map-typed per-user profile (`q_map_funcs`): event-type→count as a
    * real MapType column, exercising the map HOF family —
    * `map_from_entries` over a SORTED entry array (map iteration order
    * is insertion order, so sorting first makes every downstream
    * traversal deterministic), `transform_values` (weight the counts),
    * `map_filter` (drop singleton types), then a canonical string
    * serialization via `transform(map_entries(…))` because the
    * verification harness can't hash raw maps. One shuffle on
    * (user, type) + one on user; entry arrays are ≤ |event types|.
    */
  def mapFuncsProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val m = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("c"))))).as("counts"))
      .withColumn("weighted",
        transform_values(col("counts"), (_, v) => v * lit(10L)))
      .withColumn("frequent", map_filter(col("counts"), (_, v) => v >= 2))
    m.select(col("user_id"),
        size(col("counts")).cast("long").as("n_types"),
        size(col("frequent")).cast("long").as("n_frequent"),
        aggregate(map_values(col("weighted")), lit(0L), (a, v) => a + v)
          .as("weighted_total"),
        array_join(transform(map_entries(col("frequent")),
          en => concat(en.getField("key"), lit(":"), en.getField("value"))), ",")
          .as("frequent_profile"))
      .orderBy(col("user_id"))
  }

  /** Floor-capped running balance (`q_capped_balance`): the
    * inventory/credit-ledger fold `bal ← max(0, bal + Δ)` that no
    * window function expresses (the cap makes it non-associative and
    * non-linear), implemented with the TYPED Dataset escape hatch —
    * `groupByKey(user).mapGroups` folding the user's events in
    * (ts, event_id) order. Per-group state is one user's event list
    * (bounded at any corpus size); the shuffle is the same single
    * key-exchange a window would pay. Deltas are integral cents via
    * floor (floor of an IEEE product is engine-independent where
    * half-up rounding is not); purchases debit, everything else
    * credits.
    */
  def cappedBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_id"),
        (floor(col("value") * 100).cast("long") *
          when(col("event_type") === "purchase", lit(-1L)).otherwise(lit(1L)))
          .as("delta"))
      .as[(Long, Long, Long, Long)]
    e.groupByKey(_._1)
      .mapGroups { (user, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var bal = 0L
        rows.foreach { r => bal = math.max(0L, bal + r._4) }
        (user, rows.length.toLong, bal)
      }
      .toDF("user_id", "n_events", "final_balance")
      .orderBy(col("user_id"))
  }

  /** Association rules (`q_market_basket`): support / confidence /
    * lift for type→type rules over user-day BASKETS — the apriori
    * 2-itemset pass. Baskets are the DISTINCT (user, day, type)
    * table (pre-shrunk, never raw events); pairs meet through a
    * co-keyed self-join on the basket id; singleton supports join in
    * broadcast (|types| rows). Directed rules (a→b and b→a both
    * emitted) because confidence is asymmetric. All ratios from
    * integral counts, rounded at the edge.
    */
  def marketBasket(spark: SparkSession, dir: String,
      minSupport: Int = 10): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val baskets = e.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type")).distinct().cache()
    val nBaskets = baskets.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val single = baskets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), Seq("user_id", "day"))
      .filter(col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("lhs"), col("b.event_type").as("rhs"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(broadcast(single.select(col("event_type").as("lhs"),
        col("n").as("n_lhs"))), Seq("lhs"))
      .join(broadcast(single.select(col("event_type").as("rhs"),
        col("n").as("n_rhs"))), Seq("rhs"))
      .crossJoin(broadcast(nBaskets))
      .select(col("lhs"), col("rhs"), col("n_both"), col("n_lhs"), col("n_rhs"),
        round(col("n_both").cast("double") / col("n_baskets").cast("double"), 6)
          .as("support"),
        round(col("n_both").cast("double") / col("n_lhs").cast("double"), 6)
          .as("confidence"),
        round(col("n_both").cast("double") * col("n_baskets").cast("double") /
          (col("n_lhs").cast("double") * col("n_rhs").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lhs"), col("rhs"))
  }

  /** Frequent 3-itemsets (`q_itemset3`): the apriori level-3 pass —
    * and, read as a graph, weighted TRIANGLE counting on the
    * co-occurrence graph. Two self-joins of the DISTINCT basket table
    * co-keyed on (user, day) with the canonical a<b<c order; per-
    * basket fan-out is C(k,3) with k bounded by the TYPE domain, so
    * pair volume is linear in baskets regardless of corpus size.
    * Support is an integral count; the ratio rounds at the edge.
    */
  def itemset3(spark: SparkSession, dir: String, minSupport: Int = 5): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val baskets = e.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type")).distinct()
    val nBaskets = baskets.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    baskets.as("a")
      .join(baskets.as("b"), Seq("user_id", "day"))
      .join(baskets.as("c"), Seq("user_id", "day"))
      .filter(col("a.event_type") < col("b.event_type") &&
        col("b.event_type") < col("c.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"),
        col("c.event_type").as("t3"))
      .agg(count(lit(1)).as("n_all3"))
      .filter(col("n_all3") >= minSupport)
      .crossJoin(broadcast(nBaskets))
      .select(col("t1"), col("t2"), col("t3"), col("n_all3"),
        round(col("n_all3").cast("double") / col("n_baskets").cast("double"), 6)
          .as("support"))
      .orderBy(col("t1"), col("t2"), col("t3"))
  }

  /** Kaplan–Meier survival (`q_survival`): S(t) over user activity
    * lifetimes with right-censoring (users still active in the final
    * week are censored, their lifetimes only feed the at-risk set).
    * At-risk counts come from a SUFFIX cumsum over the bounded
    * distinct-duration grid; the survival product is
    * exp(Σ ln(1−d/n)) so both engines run the identical ln/exp
    * sequence instead of an engine-specific product aggregate.
    */
  def survivalCurve(spark: SparkSession, dir: String,
      censorFrom: String = "2024-01-24"): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val life = e.groupBy(col("user_id"))
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          .cast("long").as("t"),
        (max(to_date(col("ts"))) >= lit(censorFrom)).as("censored"))
    val grid = life.groupBy(col("t"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("d"),
        count(lit(1)).as("c"))
    val wAll = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
    grid.withColumn("n_risk", sum(col("c")).over(wAll))
      .withColumn("lnterm",
        when(col("d") > 0, log(lit(1.0) -
          col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("surv", exp(sum(col("lnterm")).over(wCum)))
      .select(col("t"), col("d").as("n_churned"), col("n_risk"),
        round(col("surv"), 6).as("survival"))
      .orderBy(col("t"))
  }

  /** Event-type co-occurrence (`q_cooccurrence`): market-basket shape —
    * which event types share users. The self-join runs on the DISTINCT
    * (user, type) table (≤ |users|·|types| rows, radically smaller than
    * the event log) keyed on user, so at scale it's one co-partitioned
    * join of a pre-shrunk table with itself, never events×events.
    * Jaccard derives from per-type totals joined twice (broadcast —
    * |types| rows).
    */
  def typeCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val ut = e.select(col("user_id"), col("event_type")).distinct().cache()
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.as("a").join(ut.as("b"), Seq("user_id"))
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.withColumnRenamed("event_type", "t1")
        .withColumnRenamed("n", "n1")), Seq("t1"))
      .join(broadcast(totals.withColumnRenamed("event_type", "t2")
        .withColumnRenamed("n", "n2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
        round(col("n_both").cast("double") /
          (col("n1") + col("n2") - col("n_both")).cast("double"), 6).as("jaccard"))
      .orderBy(col("t1"), col("t2"))
  }
}
