package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SortableDoubleBits
import graft.sources.Tables

/** Exact per-group median with scale-independent memory.
  *
  * Why: the r10 skew soak measured the boundary of the classic exact
  * median (`percentile`, a per-group count-map buffer): a Zipf hot key
  * with ~40M distinct values completes at 1000x on a 48 GB heap at
  * 1.52x the GK sketch — and one more decade puts the buffer past
  * executor memory (docs/SCALING.md, `aggmedhc_*`). The usual answer
  * is "switch to the sketch", which gives up exactness. This operator
  * keeps exactness at ANY group cardinality by binary-searching the
  * VALUE DOMAIN of the oversized groups instead of buffering their
  * values:
  *
  *  1. One algebraic pass counts rows and brackets min/max per key
  *     (partial aggregation makes this skew-immune — measured).
  *  2. Keys at or under `hotThreshold` rows take the classic exact
  *     percentile; their buffer is bounded by the THRESHOLD — a knob —
  *     not by the data.
  *  3. For each oversized ("hot") key — by construction a handful; a
  *     corpus where millions of keys exceed the threshold has no skew
  *     problem to survive — the median ranks k1 = ⌊(n+1)/2⌋ and
  *     k2 = ⌊(n+2)/2⌋ are located by iterated histogram refinement
  *     over the ORDER-PRESERVING BIT IMAGE of the value
  *     ([[graft.functions.SortableDoubleBits]]): each pass buckets the
  *     key's current [lo, hi] bit interval into `buckets` integer-
  *     exact sub-ranges, counts rows per (key, bucket) — an algebraic
  *     aggregation whose state is O(buckets) per key — and narrows to
  *     the bucket holding the target ranks. Integer interval
  *     arithmetic means the histogram a pass counts and the range the
  *     next pass narrows to can never disagree (float bucket edges
  *     can misplace boundary values); the interval shrinks by ~the
  *     bucket count per pass, so ≤ ⌈64 / log2(buckets)⌉ + 1 passes
  *     cover the whole double domain.
  *  4. Three exact endgames: a single-bit-value interval IS the median
  *     (plateau); ranks k1 ≠ k2 falling in different buckets means the
  *     median straddles a bucket edge whose below-count is exactly k1,
  *     so one conditional max/min pass yields both order statistics;
  *     otherwise once the interval holds ≤ `finish` rows they are
  *     collected per key and the ranks read off directly.
  *
  * Cost shape: 1 full pass for counts, 1 full pass that EXTRACTS the
  * hot keys' rows into a DISK_ONLY persisted subset (at Zipf(1.1) a
  * minority of the corpus — the passes must not re-scan 100 TB to
  * reach 7% of it), then (passes + 1) jobs over that subset; with the
  * default `finish` the pass count is usually 1-2 — narrowing runs
  * only until the candidate interval fits one bounded collect, not
  * until it pinpoints the value. Hot medians resolve EAGERLY (at most
  * `maxHotKeys` driver rows) and the subset is unpersisted before
  * returning, so the returned lazy plan is just the small-key
  * percentile plus a literal hot-median table — one more full pass
  * when the caller consumes it. Executor memory per key is
  * O(max(hotThreshold, finish, buckets)) — all knobs, none scaling
  * with the data; driver traffic per pass is O(hotKeys) rows (rank
  * location runs in a per-key window on the executors, only the
  * chosen bucket edges come back).
  *
  * Numerics: medians of even-count groups average two order
  * statistics — identical to linear interpolation at 0.5 up to one
  * ulp. NaN and null values are excluded (DuckDB `median` semantics;
  * Spark's `percentile` sorts NaN last instead — don't feed NaN to
  * either and expect cross-engine agreement). −0.0 orders just below
  * +0.0 in bit space; both compare numerically equal, so any selected
  * order statistic is numerically correct.
  *
  * This extends the engine's own exact-median operator (`q_median`,
  * [[graft.operators.Analytics.medianPricePerPriority]]) past the
  * group size where its per-group buffer stops fitting an executor —
  * a capability the reference pipeline (single-node pandas at
  * sample_size=888) never needs, and a 100 TB group-by cannot live
  * without.
  */
object Quantiles {

  /** Driver-side narrowing state for one hot key: the interpolated
    * quantile at `p` needs order statistics k1 = ⌊p(n−1)⌋+1 and
    * k2 = ⌈p(n−1)⌉+1 (1-based) combined as v1 + (v2−v1)·frac — the
    * same linear-interpolation rule Spark's `percentile` and DuckDB's
    * `quantile_cont` use, computed in double like both engines.
    */
  private final class HotState(
      val key: Any, val n: Long, p: Double, var lo: Long, var hi: Long) {
    private val pos: Double = p * (n - 1)
    val k1: Long = math.floor(pos).toLong + 1
    val k2: Long = math.ceil(pos).toLong + 1
    val frac: Double = pos - math.floor(pos)
    var below: Long = 0L // rows with bits < lo (bit order, exact)
    var inCount: Long = n // rows with lo <= bits <= hi
    var straddleCut: Option[Long] = None // bit edge with exactly k1 rows <= it
    var result: Option[Double] = None
    def open(finishAt: Long): Boolean =
      result.isEmpty && straddleCut.isEmpty &&
        (lo != hi) && inCount > finishAt
  }

  /** Exact median of `value` per `key`, any group size — the p = 0.5
    * case of [[exactQuantileAnyScale]].
    */
  def exactMedianAnyScale(
      rows: DataFrame, key: String, value: String,
      hotThreshold: Long = 4000000L,
      buckets: Int = 8192,
      finish: Long = 1048576L,
      maxHotKeys: Int = 4096): DataFrame =
    exactQuantileAnyScale(rows, key, value, 0.5,
      hotThreshold, buckets, finish, maxHotKeys)

  /** Exact linear-interpolated quantile of `value` per `key`, any
    * group size.
    *
    * @param p the quantile in [0, 1] (0.5 = median); interpolation
    *   semantics match Spark `percentile` / DuckDB `quantile_cont`.
    * @param hotThreshold groups larger than this take the narrowing
    *   path; smaller ones the classic count-map percentile (whose
    *   buffer this caps). Tune to the largest per-key buffer an
    *   executor should hold.
    * @param buckets histogram resolution per narrowing pass (memory
    *   per hot key during the pass; fewer buckets = more passes).
    * @param finish collect-and-select once a hot key's candidate
    *   interval holds at most this many rows.
    * @param maxHotKeys guard on the driver-side state (and on the
    *   per-pass histogram, ≤ maxHotKeys·(buckets+2) rows): more hot
    *   keys than this fails fast with advice to raise the threshold.
    * @return one row per distinct key: (`key` as named, `median`
    *   double — named for the flagship use; it holds the p-quantile),
    *   nulls/NaNs in `value` ignored; groups with no remaining rows
    *   are absent.
    */
  def exactQuantileAnyScale(
      rows: DataFrame, key: String, value: String, p: Double,
      hotThreshold: Long = 4000000L,
      buckets: Int = 8192,
      finish: Long = 1048576L,
      maxHotKeys: Int = 4096): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"quantile p=$p outside [0, 1]")
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(hotThreshold >= 1 && maxHotKeys >= 1,
      s"bad knobs: hotThreshold=$hotThreshold maxHotKeys=$maxHotKeys")
    require(finish >= 1 && finish <= 100000000L,
      s"finish=$finish must fit a collected per-key array")
    val spark = rows.sparkSession

    val v = col(value).cast("double")
    val base = rows
      .filter(col(value).isNotNull && !isnan(v))
      .select(col(key).as("__k"), v.as("__v"))
    val keyField = StructField("__k", base.schema("__k").dataType, nullable = true)

    // pass 0: count + value bracket per key (algebraic, skew-immune);
    // the bracket converts to bit space on the driver, so the full
    // corpus never evaluates the bit expression — only hot rows do
    val counts = base.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"), min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val hot = counts.filter(col("__n") > hotThreshold).collect()
    require(hot.length <= maxHotKeys,
      s"${hot.length} keys exceed hotThreshold=$hotThreshold (cap $maxHotKeys); " +
        "raise the threshold — a workload where this many keys are oversized " +
        "is big everywhere, not skewed")

    def finishKeys(df: DataFrame): DataFrame =
      df.select(col("__k").as(key), col("__med").as("median"))

    // joins against driver-built key tables are NULL-SAFE (`<=>`): the
    // null surrogate is the canonical hot key, and an equality join
    // would silently route a hot null group back to the unbounded
    // count-map path
    def hotJoin(left: DataFrame, right: DataFrame, how: String): DataFrame = {
      val r = broadcast(right.withColumnRenamed("__k", "__hk"))
      val j = left.join(r, col("__k") <=> col("__hk"), how)
      if (how == "inner") j.drop("__hk") else j
    }

    val hotKeysDf = spark.createDataFrame(
      hot.map(r => Row(r.get(0))).toSeq.asJava, StructType(Seq(keyField)))

    val smallMedians = (if (hot.isEmpty) base
      else hotJoin(base, hotKeysDf, "left_anti"))
      .groupBy(col("__k"))
      .agg(percentile(col("__v"), lit(p)).as("__med"))
    if (hot.isEmpty) return finishKeys(smallMedians)

    // one extraction pass; every narrowing pass then reads the (small)
    // hot subset, not the full fact. DISK_ONLY: predictable, no
    // executor-memory claim beyond the write buffers.
    val hotRows = hotJoin(base, hotKeysDf, "left_semi")
      .withColumn("__b", SortableDoubleBits.sortableBits(col("__v")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val states = hot.map { r =>
      // min/max may report either of ±0.0 (they compare equal as
      // doubles); widen the bit bracket to cover both so no row can
      // fall outside it
      val loV = r.getDouble(2)
      val hiV = r.getDouble(3)
      new HotState(r.get(0), r.getLong(1), p,
        SortableDoubleBits.toSortable(if (loV == 0.0) -0.0 else loV),
        SortableDoubleBits.toSortable(if (hiV == 0.0) 0.0 else hiV))
    }

    // interval shrinks ~buckets-fold per pass (half that on the one
    // possible mixed-sign shifted pass); this bound is generous
    val maxIter = 66 / (63 - java.lang.Long.numberOfLeadingZeros(buckets.toLong)).toInt + 4
    var iter = 0
    while (states.exists(_.open(finish)) && iter < maxIter) {
      iter += 1
      val active = states.filter(_.open(finish))

      // per-key bucket geometry, integer-exact. A mixed-sign interval
      // wider than Long.MaxValue would overflow (bits - lo); shifting
      // both by one bit is order-preserving and never needed twice.
      case class Geo(s: HotState, shift: Int, sLo: Long, sHi: Long, w: Long)
      val geo = active.map { s =>
        val wide = s.lo < 0 && s.hi > 0 &&
          (BigInt(s.hi) - BigInt(s.lo)) >= BigInt(Long.MaxValue)
        val shift = if (wide) 1 else 0
        val sLo = s.lo >> shift
        val sHi = s.hi >> shift
        Geo(s, shift, sLo, sHi, (sHi - sLo) / buckets + 1)
      }
      val boundsSchema = StructType(Seq(keyField,
        StructField("__lo", LongType), StructField("__hi", LongType),
        StructField("__slo", LongType), StructField("__w", LongType),
        StructField("__shift", IntegerType),
        StructField("__k1", LongType), StructField("__k2", LongType)))
      val bounds = spark.createDataFrame(
        geo.map(g => Row(g.s.key, g.s.lo, g.s.hi, g.sLo, g.w, g.shift,
          g.s.k1, g.s.k2)).toSeq.asJava, boundsSchema)

      // every hot row lands in exactly one monotone bucket; the -1 / B
      // sentinels keep rows outside the current interval in the rank
      // arithmetic, so ranks stay ABSOLUTE and nothing needs carrying
      // between passes except the interval itself
      val bkt = when(col("__b") < col("__lo"), lit(-1L))
        .when(col("__b") > col("__hi"), lit(buckets.toLong))
        .otherwise(expr(s"(shiftright(__b, __shift) - __slo) div __w"))
      val wnd = Window.partitionBy(col("__k")).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val edges = hotJoin(hotRows, bounds, "inner")
        .withColumn("__bkt", bkt)
        .groupBy(col("__k"), col("__bkt"))
        .agg(count(lit(1)).as("__c"), first(col("__k1")).as("__k1"),
          first(col("__k2")).as("__k2"))
        .withColumn("__cum", sum(col("__c")).over(wnd))
        .groupBy(col("__k"))
        .agg(
          min(when(col("__cum") >= col("__k1"),
            struct(col("__bkt"), col("__cum"), col("__c")))).as("__e1"),
          min(when(col("__cum") >= col("__k2"),
            struct(col("__bkt"), col("__cum"), col("__c")))).as("__e2"))
        .collect()
        .map(r => r.get(0) -> (r.getStruct(1), r.getStruct(2))).toMap

      geo.foreach { g =>
        val s = g.s
        val (e1, e2) = edges(s.key)
        val (b1, cum1, c1) = (e1.getLong(0), e1.getLong(1), e1.getLong(2))
        val b2 = e2.getLong(0)
        require(b1 >= 0 && b1 < buckets && b2 >= 0 && b2 < buckets,
          s"median rank left the bracketed interval (b1=$b1 b2=$b2) — " +
            "narrowing invariant broken")
        val mask = (1L << g.shift) - 1
        if (b1 == b2) {
          val bHiS = math.min(g.sHi, g.sLo + (b1 + 1) * g.w - 1)
          s.lo = math.max(s.lo, (g.sLo + b1 * g.w) << g.shift)
          s.hi = math.min(s.hi, (bHiS << g.shift) | mask)
          s.below = cum1 - c1
          s.inCount = c1
        } else {
          // k2 = k1 + 1 and exactly cum1 = k1 rows sit at or below the
          // upper bit edge of bucket b1: both order statistics are one
          // conditional-aggregate away
          val cutS = math.min(g.sHi, g.sLo + (b1 + 1) * g.w - 1)
          s.straddleCut = Some(math.min(s.hi, (cutS << g.shift) | mask))
        }
      }
    }
    require(!states.exists(_.open(finish)),
      s"median narrowing did not converge in $maxIter passes")

    // plateau endgame: a single-bit interval IS the value
    states.filter(s => s.result.isEmpty && s.straddleCut.isEmpty && s.lo == s.hi)
      .foreach(s => s.result = Some(SortableDoubleBits.fromSortable(s.lo)))

    // the remaining endgames resolve EAGERLY (one bounded job each over
    // the persisted subset, at most maxHotKeys rows back), so the
    // subset can be unpersisted and the returned plan stays lazy-cheap.
    // Each endgame returns the two order statistics; the interpolation
    // (v1 + (v2−v1)·frac, frac per key) happens here on the driver.
    def absorb(results: Array[Row]): Unit = {
      val byKey = results.map(r => r.get(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      states.foreach(s =>
        if (s.result.isEmpty) byKey.get(s.key).foreach { case (v1, v2) =>
          s.result = Some(v1 + (v2 - v1) * s.frac)
        })
    }

    val straddled = states.filter(_.straddleCut.isDefined)
    if (straddled.nonEmpty) {
      val cuts = spark.createDataFrame(
        straddled.map(s => Row(s.key, s.straddleCut.get)).toSeq.asJava,
        StructType(Seq(keyField, StructField("__cut", LongType))))
      absorb(hotJoin(hotRows, cuts, "inner")
        .groupBy(col("__k"))
        .agg(max(when(col("__b") <= col("__cut"), col("__v"))).as("__v1"),
          min(when(col("__b") > col("__cut"), col("__v"))).as("__v2"))
        .collect())
    }

    val collecting = states.filter(_.result.isEmpty)
    if (collecting.nonEmpty) {
      val fin = spark.createDataFrame(
        collecting.map(s => Row(s.key, s.lo, s.hi,
          s.k1 - s.below, s.k2 - s.below)).toSeq.asJava,
        StructType(Seq(keyField,
          StructField("__lo", LongType), StructField("__hi", LongType),
          StructField("__r1", LongType), StructField("__r2", LongType))))
      absorb(hotJoin(hotRows, fin, "inner")
        .filter(col("__b") >= col("__lo") && col("__b") <= col("__hi"))
        .groupBy(col("__k"))
        .agg(sort_array(collect_list(col("__v"))).as("__vs"),
          first(col("__r1")).as("__r1"), first(col("__r2")).as("__r2"))
        .select(col("__k"),
          element_at(col("__vs"), col("__r1").cast("int")).as("__v1"),
          element_at(col("__vs"), col("__r2").cast("int")).as("__v2"))
        .collect())
    }
    hotRows.unpersist()
    require(states.forall(_.result.isDefined),
      "a hot key resolved no median — endgame invariant broken")

    val hotMedians = spark.createDataFrame(
      states.map(s => Row(s.key, s.result.get)).toSeq.asJava,
      StructType(Seq(keyField, StructField("__med", DoubleType))))
    finishKeys(smallMedians.unionByName(hotMedians))
  }

  /** `q_median_narrow` gate surface: the narrowing median against the
    * classic-percentile groups the oracle can replay — hotThreshold
    * forced low so every group takes the narrowing path, buckets kept
    * small so the gate exercises multiple refinement passes and the
    * collect endgame, not just one histogram.
    */
  def medianNarrow(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    exactMedianAnyScale(l, "l_returnflag", "l_extendedprice",
      hotThreshold = 100L, buckets = 64, finish = 48L)
      .select(col("l_returnflag"), round(col("median"), 4).as("med"))
      .orderBy(col("l_returnflag"))
  }

  /** `q_quantile_narrow` gate surface: the general-p narrowing
    * quantile (p90 here — frac-weighted interpolation, not the
    * median's midpoint) against DuckDB `quantile_cont`; knobs forced
    * low like the median gate so refinement and the endgames run.
    */
  def quantileNarrow(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    exactQuantileAnyScale(l, "l_linenumber", "l_extendedprice", 0.9,
      hotThreshold = 100L, buckets = 64, finish = 48L)
      .select(col("l_linenumber"), round(col("median"), 4).as("p90"))
      .orderBy(col("l_linenumber"))
  }
}
