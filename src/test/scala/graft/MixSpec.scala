package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Analytics

/** Round-3 session-5 operators: TPC-H Q3/Q5 join shapes, day-of-week
  * seasonality, token-budget mixture sampling.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  test("ship priority: revenue matches a driver-side recompute of the filtered join") {
    val rows = Analytics.shipPriority(spark, sf).collect()
    assert(rows.length <= 10)
    // strictly ordered by revenue desc then key
    for (i <- 1 until rows.length) {
      val (a, b) = (rows(i - 1), rows(i))
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
    }
    // recompute one order's revenue from raw tables in cents
    if (rows.nonEmpty) {
      val key = rows.head.getLong(0)
      val cents = graft.sources.Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") === key &&
          to_date(col("l_shipdate")) > to_date(lit("1997-06-01")))
        .select((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
          .as("r"))
        .agg(sum(col("r")).cast("decimal(18,2)").as("r2"))
        .select((col("r2") * 100).cast("long")).as[Long].head()
      assert(rows.head.getLong(1) === cents)
    }
  }

  test("region volume: every nation is in the region, revenue positive") {
    val rows = Analytics.regionVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val asia = graft.sources.Tables.load(spark, sf, "nation")
      .join(graft.sources.Tables.load(spark, sf, "region")
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).as[String].collect().toSet
    for (r <- rows) {
      assert(asia.contains(r.getString(0)))
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
    }
  }

  test("seasonality: per-type weighted mean of the index over dow slots is 1") {
    val rows = Analytics.seasonalityDow(spark, sf).collect()
    val days = graft.sources.Tables.load(spark, sf, "events")
      .select(to_date(col("ts")).as("d")).distinct()
      .select(expr("weekday(d) + 1").cast("long")).as[Long].collect()
    val dowDays = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totDays = days.length.toLong
    // sum over dow of index * (dd/dt) * (st) == st  =>  Σ sd == st
    for ((t, rs) <- rows.groupBy(_.getString(0))) {
      val st = rs.map(_.getLong(2)).sum
      val back = rs.map { r =>
        r.getDouble(3) * dowDays(r.getLong(1)) / totDays * st
      }.sum
      assert(math.abs(back - st) / st < 1e-4, s"type $t")
    }
  }

  test("mixture sample: rates are exact integer arithmetic and kept counts honor buckets") {
    val rows = TextFunctions.mixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val tokTotal = rows.map(_.getLong(1)).sum
    val budget = tokTotal * 40 / 100
    val w = TextFunctions.mixtureWeights.toMap
    for (r <- rows) {
      val (src, tokS) = (r.getString(0), r.getLong(1))
      val budgetS = budget * w(src) / 1000
      assert(r.getLong(2) === budgetS, s"budget $src")
      assert(r.getLong(3) === math.min(1000L, budgetS * 1000 / tokS), s"rate $src")
      assert(r.getLong(4) >= 0L && r.getLong(5) >= 0L)
      // a full-rate source keeps every doc
      if (r.getLong(3) == 1000L) assert(r.getLong(5) === tokS)
    }
    // deterministic: rerun is identical
    val again = TextFunctions.mixtureSample(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("sparse cosine: dot/norm agree with a driver-side recompute on one pair") {
    val rows = graft.operators.Similarity.sparseCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect()
      .toMap.view.mapValues(
        _.split("[^a-z0-9]+").filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    // vocabulary: 2 <= df <= 50 over the whole corpus
    val df = docs.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val vocab = df.filter { case (_, d) => d >= 2 && d <= 50 }.keySet
    val r = rows.head
    val (a, b) = (docs(r.getLong(1)), docs(r.getLong(0)))
    val dot = (a.keySet & b.keySet & vocab).toSeq.map(t => a(t) * b(t)).sum
    assert(r.getLong(2) === dot, "dot")
    def nrm(m: Map[String, Long]) = m.filter(kv => vocab(kv._1)).values.map(c => c * c).sum
    val cos = dot.toDouble / (math.sqrt(nrm(a).toDouble) * math.sqrt(nrm(b).toDouble))
    assert(math.abs(r.getDouble(3) - cos) < 1e-6, "cos")
    assert(cos >= 0.4)
  }

  test("entity resolution: canonical is the min name of a connected component") {
    val rows = graft.operators.Fusion.entityResolution(spark, sf).collect()
    val pairs = graft.operators.Fusion.fuzzyNameJoin(spark, sf)
      .select(col("name_a"), col("name_b")).as[(String, String)].collect()
    // driver-side union-find
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val byRoot = rows.map(_.getString(0)).groupBy(find)
    for (r <- rows) {
      val comp = byRoot(find(r.getString(0)))
      assert(r.getString(1) === comp.min, s"canonical of ${r.getString(0)}")
      assert(r.getLong(2) === comp.length.toLong, s"size of ${r.getString(0)}")
    }
  }

  test("shortest path: source at 0, every hop-d node has a hop-(d-1) predecessor") {
    val rows = Analytics.shortestPath(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("click") === 0L)
    val edges = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).values.flatMap { es =>
        es.sortBy(e => (micros(e._3), e._4)).sliding(2).collect {
          case Array(x, y) => (x._2, y._2)
        }
      }.toSet
    for ((t, d) <- rows if d > 0)
      assert(edges.exists { case (f, to) => to == t && rows.get(f).exists(_ == d - 1) },
        s"$t reachable at $d")
  }

  test("bollinger: bands bracket the mid and match a driver fold on one user") {
    // columns: user_id(0) event_id(1) value(2) n(3) mid(4) lower(5) upper(6)
    val rows = Analytics.bollinger(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getDouble(5) <= r.getDouble(4) + 1e-9 &&
      r.getDouble(4) <= r.getDouble(6) + 1e-9)
    // driver recompute for user 0's series
    val series = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("user_id") === 0 && col("value").isNotNull)
      .select(col("event_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(e => (micros(e._2), e._1))
    val cents = series.map(e => math.floor(e._3 * 100).toLong)
    val got = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
    assert(got.length === series.length)
    val byId = series.map(_._1).zipWithIndex.toMap
    for (r <- got) {
      val i = byId(r.getLong(1))
      val win = cents.slice(math.max(0, i - 6), i + 1)
      val (n, sx, sxx) = (win.length.toLong, win.sum, win.map(c => c * c).sum)
      assert(r.getLong(3) === n)
      val mid = sx.toDouble / n / 100.0
      assert(math.abs(r.getDouble(4) - mid) < 1e-6, s"mid at ${r.getLong(1)}")
      val sd = math.sqrt((n * sxx - sx * sx).toDouble) / n / 100.0
      assert(math.abs(r.getDouble(6) - (mid + 2.0 * sd)) < 1e-6)
    }
  }

  test("rolling median: picked value is the ceil(n/2)-th sorted frame element") {
    val rows = Analytics.rollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    val series = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("user_id") === 0 && col("value").isNotNull)
      .select(col("event_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(e => (micros(e._2), e._1))
    val cents = series.map(e => math.floor(e._3 * 100).toLong)
    val byId = series.map(_._1).zipWithIndex.toMap
    for (r <- rows.filter(_.getLong(0) == 0L)) {
      val i = byId(r.getLong(1))
      val win = cents.slice(math.max(0, i - 6), i + 1).sorted
      assert(r.getLong(2) === win.length.toLong)
      assert(r.getLong(3) === win((win.length + 1) / 2 - 1), s"median at ${r.getLong(1)}")
    }
  }

  test("except all: multiplicity is per-key click minus view counts, floored at 0") {
    val got = graft.operators.Relational.exceptAllClicks(spark, sf).collect()
      .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length).toMap
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd")).as[(String, Long, String)].collect()
    def bag(t: String) = e.filter(_._1 == t).groupBy(x => (x._2, x._3))
      .view.mapValues(_.length).toMap
    val (clicks, views) = (bag("click"), bag("view"))
    val expect = clicks.map { case (k, c) => k -> math.max(0, c - views.getOrElse(k, 0)) }
      .filter(_._2 > 0)
    assert(got === expect)
  }

  test("audio energy: amp0 is the first byte of each chunk's sample range") {
    val rows = graft.multimodal.Multimodal.audioEnergy(spark, sf).collect()
    assert(rows.nonEmpty)
    val payloads = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .toMap.view.mapValues(_.getBytes("UTF-8")).toMap
    // recompute start_sample per chunk from the decode rule
    for (r <- rows.take(50)) {
      val bytes = payloads(r.getLong(0))
      val rate = 8000 + (java.lang.Byte.toUnsignedInt(bytes(0)) % 5) * 8000
      val startSample = r.getLong(1) * rate
      val b = java.lang.Byte.toUnsignedInt(bytes((startSample * 2).toInt))
      assert(r.getLong(3) === b.toLong, s"amp0 doc ${r.getLong(0)} chunk ${r.getLong(1)}")
      assert((r.getLong(4) == 1L) === (b < 32))
    }
  }

  test("rake keywords: top phrase score matches a driver-side RAKE on sample docs") {
    val rows = TextFunctions.rakeKeywords(spark, sf).collect()
    assert(rows.nonEmpty)
    val sw = TextFunctions.stopwords.toSet
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect().toMap
    for (r <- rows.take(20)) {
      val toks = docs(r.getLong(0)).split("[^a-z0-9]+").filter(_.nonEmpty)
      // phrases: maximal stopword-free runs
      val phrases = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      var cur = Vector.empty[String]
      for (t <- toks) {
        if (sw(t)) { if (cur.nonEmpty) phrases += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) phrases += cur
      val deg = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (p <- phrases; w <- p) deg(w) += p.length.toLong
      val best = phrases.map(p => (p.map(deg).sum, p.mkString(" ")))
        .sortBy { case (s, ph) => (-s, ph) }.head
      assert(r.getString(1) === best._2, s"keyword of doc ${r.getLong(0)}")
      assert(r.getLong(2) === best._1, s"score of doc ${r.getLong(0)}")
    }
  }

  test("scene cuts: probes match payload bytes and cuts flag threshold jumps") {
    val rows = graft.multimodal.Multimodal.sceneCuts(spark, sf).collect()
    assert(rows.nonEmpty)
    val payloads = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .toMap.view.mapValues(_.getBytes("UTF-8")).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    for ((doc, frames) <- byDoc.take(30)) {
      val bytes = payloads(doc)
      val nFrames = 1 + (if (bytes.length >= 2) java.lang.Byte.toUnsignedInt(bytes(1)) else 0) % 240
      val sorted = frames.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (0L until 8L))
      for ((r, i) <- sorted.zipWithIndex) {
        val expectIdx = math.floor(i.toDouble * nFrames / 8.0).toLong
        assert(r.getLong(2) === expectIdx)
        val probe = java.lang.Byte.toUnsignedInt(bytes((expectIdx % bytes.length).toInt))
        assert(r.getLong(3) === probe.toLong, s"probe doc $doc frame $i")
        if (i == 0) assert(r.getLong(4) === 0L)
        else assert((r.getLong(4) == 1L) ===
          (math.abs(probe - sorted(i - 1).getLong(3)) > 64))
      }
    }
  }

  test("mwu test: doubled U matches a driver-side midrank computation") {
    val rows = Analytics.mwuTest(spark, sf).collect()
    assert(rows.nonEmpty)
    val e = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("user_id"), col("value"))
      .as[(String, Long, Double)].collect()
    for (r <- rows) {
      val vals = e.filter(_._1 == r.getString(0))
        .map(x => (math.floor(x._3 * 100).toLong, x._2 % 2 == 0))
      val (na, nb) = (vals.count(_._2).toLong, vals.count(!_._2).toLong)
      assert(r.getLong(1) === na && r.getLong(2) === nb)
      // midranks over the combined sample
      val sorted = vals.map(_._1).sorted
      val rankOf = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => g.map(_._2 + 1).sum.toDouble / g.length).toMap
      val rA = vals.filter(_._2).map(v => rankOf(v._1)).sum
      val u2 = 2.0 * rA - na * (na + 1)
      assert(math.abs(r.getLong(3) - u2) < 1e-6, s"U2 of ${r.getString(0)}")
    }
  }

  test("period detect: winning lag has max r among driver-recomputed lags") {
    val rows = Analytics.periodDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val series = daily(r.getString(0)).map(x => x._2 -> x._3).toMap
      def rAt(lag: Long): Option[Double] = {
        val ps = series.toSeq.flatMap { case (d, x) =>
          series.get(d + lag).map(y => (x.toDouble, y.toDouble))
        }
        val n = ps.length.toDouble
        if (n == 0) None else {
          val (sx, sy) = (ps.map(_._1).sum, ps.map(_._2).sum)
          val sxy = ps.map(p => p._1 * p._2).sum
          val sxx = ps.map(p => p._1 * p._1).sum
          val syy = ps.map(p => p._2 * p._2).sum
          val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
          if (den <= 0) None else Some((n * sxy - sx * sy) / math.sqrt(den))
        }
      }
      val all = (1L to 14L).flatMap(l => rAt(l).map(l -> _))
      val best = all.minBy { case (l, rv) => (-rv, l) }
      assert(r.getLong(1) === best._1, s"lag of ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - best._2) < 1e-5)
    }
  }

  test("itemset3: triple support matches a driver-side basket scan") {
    val rows = graft.operators.Relational.itemset3(spark, sf).collect()
    val baskets = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"), col("event_type"))
      .distinct().as[(Long, String, String)].collect()
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).toSet).toMap
    val counts = scala.collection.mutable.Map[(String, String, String), Int]()
      .withDefaultValue(0)
    for (types <- baskets.values; t <- types.toSeq.sorted.combinations(3))
      counts((t(0), t(1), t(2))) += 1
    val expect = counts.filter(_._2 >= 5)
    assert(rows.length === expect.size)
    for (r <- rows)
      assert(r.getLong(3) === expect((r.getString(0), r.getString(1), r.getString(2))).toLong)
  }

  test("oph minhash: reported pairs have exact trigram jaccard >= 0.7") {
    val rows = graft.operators.Dedup.ophPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect().toMap
    def tris(id: Long): Set[String] = {
      val w = docs(id).split("[^a-z0-9]+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (r <- rows) {
      val (a, b) = (tris(r.getLong(0)), tris(r.getLong(1)))
      val j = (a & b).size.toDouble / (a | b).size
      assert(j >= 0.7, s"pair ${r.getLong(0)},${r.getLong(1)}")
      assert(math.abs(r.getDouble(2) - j) < 1e-6)
    }
    // OPH candidates are a (possibly proper) subset of the classic
    // minhash detector's verified pairs at the same threshold
    val classic = graft.operators.Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oph = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((oph -- classic).forall { case (x, y) =>
      val j = { val (a, b) = (tris(x), tris(y)); (a & b).size.toDouble / (a | b).size }
      j >= 0.7
    })
  }

  test("sentence dedup: hot sentences dropped, kept counts bounded by totals") {
    val rows = TextFunctions.sentenceDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect()
    def sentences(t: String): Seq[String] =
      t.split("[.!?]+", -1).map(_.trim).filter(_.nonEmpty).toSeq
    // cross-doc distinct counts
    val docCount = scala.collection.mutable.Map[String, Set[Long]]()
      .withDefaultValue(Set.empty)
    for ((id, t) <- docs; s <- sentences(t).distinct) docCount(s) += id
    val byId = docs.toMap
    for (r <- rows.take(40)) {
      val sents = sentences(byId(r.getLong(0)))
      assert(r.getLong(1) === sents.length.toLong, s"n_sent of ${r.getLong(0)}")
      val kept = sents.filter(s => docCount(s).size < 3)
      assert(r.getLong(2) === kept.length.toLong, s"n_kept of ${r.getLong(0)}")
    }
  }

  test("delta encode: byte totals match a driver-side zigzag varint fold") {
    val rows = Analytics.deltaEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    val series = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("user_id") === 3 && col("value").isNotNull)
      .select(col("event_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(e => (micros(e._2), e._1))
    def zig(x: Long) = if (x >= 0) x * 2 else x * -2 - 1
    def vb(z: Long) = { var n = 1; var lim = 128L
      while (n < 10 && lim > 0 && z >= lim) { n += 1; lim <<= 7 }; n.toLong }
    var (prevUs, prevC) = (Option.empty[Long], 0L)
    var total = 0L
    for ((id, t, v) <- series) {
      val us = micros(t); val c = math.floor(v * 100).toLong
      total += vb(zig(us - prevUs.getOrElse(us))) + vb(zig(c - prevC))
      prevUs = Some(us); prevC = c
    }
    val got = rows.find(_.getLong(0) == 3L).get
    assert(got.getLong(1) === series.length.toLong)
    assert(got.getLong(3) === total, "delta bytes of user 3")
    assert(got.getLong(2) === series.length.toLong * 16)
  }

  test("time to convert: quartiles are stored latencies at ceil(n*p)") {
    val r = Analytics.timeToConvert(spark, sf).collect().head
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect()
    val lats = e.groupBy(_._1).flatMap { case (_, es) =>
      val clicks = es.filter(_._2 == "click").map(x => micros(x._3))
      if (clicks.isEmpty) None else {
        val fc = clicks.min
        val purch = es.filter(x => x._2 == "purchase" && micros(x._3) >= fc)
        if (purch.isEmpty) None else Some(purch.map(x => micros(x._3)).min - fc)
      }
    }.toSeq.sorted
    assert(r.getLong(0) === lats.length.toLong)
    def disc(p: Double) = lats(math.ceil(lats.length * p).toInt - 1)
    assert(r.getLong(1) === disc(0.25))
    assert(r.getLong(2) === disc(0.5))
    assert(r.getLong(3) === disc(0.75))
  }

  test("knn classify: majority of 5 nearest labeled vectors, deterministic ties") {
    val rows = graft.operators.Similarity.knnClassify(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label").cast("long"))
      .as[(Long, Array[Float], Long)].collect()
    val labeled = emb.filter(_._1 % 5 != 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = emb.map(x => x._1 -> x).toMap
    for (r <- rows.take(25)) {
      val q = byId(r.getLong(0))
      val nn = labeled.map(l => (cos(q._2, l._2), l._1, l._3))
        .sortBy(x => (-x._1, x._2)).take(5)
      val votes = nn.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (l, n) => (-n, l) }
      assert(r.get(1).toString.toLong === votes.head._1, s"label of ${r.getLong(0)}")
      assert(r.get(3).toString.toLong === q._3)
      assert((r.getLong(4) == 1L) === (votes.head._1 == q._3))
    }
  }

  test("hll intersect: estimate within 15% of exact for non-tiny overlaps") {
    val rows = Analytics.hllIntersect(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (est, exact) = (r.getLong(2), r.getLong(3))
      if (exact >= 100)
        assert(math.abs(est - exact).toDouble / exact < 0.15,
          s"${r.getString(0)}∩${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("row-group stats: footer min/max/nulls are truthful vs the data") {
    val rows = graft.sources.SchemaAlign.rowGroupStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val (lo, hi, n, nulls) = o
      .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)),
        sum(col("o_orderkey").isNull.cast("long")))
      .as[(Long, Long, Long, Long)].head()
    assert(rows.map(_.getLong(1)).sum === n) // row counts cover the table
    assert(rows.map(_.getLong(2)).min === lo) // global min appears in some group
    assert(rows.map(_.getLong(3)).max === hi)
    assert(rows.map(_.getLong(4)).sum === nulls)
    for (r <- rows) assert(r.getLong(2) <= r.getLong(3))
  }

  test("semantic sweep: monotone in threshold and consistent with semanticSurvivors") {
    val rows = graft.operators.Dedup.semanticSweep(spark, sf).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length === 3)
    // higher threshold -> fewer dropped
    for (i <- 1 until rows.length)
      assert(rows(i).getLong(1) <= rows(i - 1).getLong(1))
    // the 0.3 row matches the full survivor operator
    val survivors = graft.operators.Dedup.semanticSurvivors(spark, sf).count()
    val r03 = rows.find(r => math.abs(r.getDouble(0) - 0.3) < 1e-9).get
    assert(r03.getLong(2) === survivors)
  }

  test("new vs returning: every user is new exactly once, splits sum to dau") {
    val rows = Analytics.newReturning(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum === nUsers)
    for (r <- rows) assert(r.getLong(1) === r.getLong(2) + r.getLong(3))
    assert(rows.head.getLong(3) === 0L) // day one: everyone is new
  }

  test("typed aggregator plans partial aggregation and matches builtin aggregates") {
    val rows = Analytics.typedAgg(spark, sf)
    val plan = rows.queryExecution.executedPlan.toString
    // partial + final pair, like a builtin aggregate
    assert("(?s).*Aggregate.*Aggregate.*".r.matches(plan) ||
      plan.contains("ObjectHashAggregate"))
    val got = rows.collect()
    val expect = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull && col("user_id") < 50)
      .select(col("user_id"), floor(col("value") * 100).cast("long").as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)), sum(col("c")), min(col("c")), max(col("c")))
      .orderBy(col("user_id")).collect()
    assert(got.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
  }

  test("observe: pipeline metrics ride along the job without a second scan") {
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    val df = graft.sources.Tables.load(spark, sf, "events")
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("n_null_value"))
      .filter(col("event_type") === "click")
    val clicks = df.count()
    val m = obs.get
    // the observation saw EVERY scanned row, not just the filtered ones
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(m("n_rows") === total)
    assert(clicks < total)
    val nulls = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNull).count()
    assert(m("n_null_value") === nulls)
  }

  test("bigram lm: NLL matches a driver-side add-1 model on sample docs") {
    val rows = TextFunctions.bigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect()
    val tokenized = docs.map { case (id, t) =>
      id -> t.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq }
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val bi = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for ((_, ts) <- tokenized) {
      ts.foreach(w => uni(w) += 1)
      ts.sliding(2).foreach { case Seq(x, y) => bi((x, y)) += 1; case _ => () }
    }
    val v = uni.size.toLong
    val byId = tokenized.toMap
    for (r <- rows.take(20)) {
      val ts = byId(r.getLong(0))
      val lnps = ts.sliding(2).collect { case Seq(x, y) =>
        math.log((bi((x, y)) + 1).toDouble / (uni(x) + v)) }.toSeq
      assert(r.getLong(1) === lnps.length.toLong)
      val s = lnps.reduceLeft(_ + _)
      assert(math.abs(r.getDouble(2) - (-s)) < 1e-6, s"nll of ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - math.exp(-s / lnps.length)) < 1e-6)
    }
  }

  test("layout invariance: order-sensitive ops agree across partition layouts") {
    // the scale-correctness property: a different partition layout (as a
    // cluster would produce) must not change a single byte of output
    val sc = spark
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val p = sc.conf.get("spark.sql.shuffle.partitions")
    try {
      val a1 = canon(TextFunctions.bigramLm(spark, sf))      // ordered fold
      val b1 = canon(graft.operators.Similarity.sparseCosine(spark, sf))
      val c1 = canon(Analytics.ewmaDaily(spark, sf))          // ordered fold
      val d1 = canon(TextFunctions.bm25(spark, sf))
      sc.conf.set("spark.sql.shuffle.partitions", "13")
      val a2 = canon(TextFunctions.bigramLm(spark, sf))
      val b2 = canon(graft.operators.Similarity.sparseCosine(spark, sf))
      val c2 = canon(Analytics.ewmaDaily(spark, sf))
      val d2 = canon(TextFunctions.bm25(spark, sf))
      assert(a1 === a2, "bigramLm layout-dependent")
      assert(b1 === b2, "sparseCosine layout-dependent")
      assert(c1 === c2, "ewma layout-dependent")
      assert(d1 === d2, "bm25 layout-dependent")
    } finally sc.conf.set("spark.sql.shuffle.partitions", p)
  }

  test("rollup cascade: minute->hour->day equals raw->day") {
    val cascade = Analytics.rollupCascade(spark, sf).collect().map(_.toSeq)
    val direct = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("event_type"), col("day")).collect().map(_.toSeq)
    assert(cascade.toSeq === direct.toSeq)
  }

  test("psi: buckets partition both populations; near-zero drift on a parity split") {
    val rows = Analytics.psi(spark, sf).collect()
    assert(rows.length === 10)
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val nRef = o.filter(col("o_orderkey") % 2 === 0).count()
    val nCur = o.filter(col("o_orderkey") % 2 === 1).count()
    assert(rows.map(_.getLong(1)).sum === nRef)
    assert(rows.map(_.getLong(2)).sum === nCur)
    // a random parity split shouldn't drift: total PSI well under 0.1
    val psi = rows.map(_.getDouble(3)).sum
    assert(psi >= 0.0 - 1e-9 && psi < 0.1, s"psi $psi")
    // reference deciles: each bucket holds ~10% of ref
    for (r <- rows)
      assert(math.abs(r.getLong(1).toDouble / nRef - 0.1) < 0.03)
  }

  test("holt: fold matches a driver-side recurrence; flat series has zero trend") {
    val rows = Analytics.holt(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val xs = daily(r.getString(0)).sortBy(_._2).map(_._3.toDouble)
      var l = xs(0); var b = xs(1) - xs(0)
      for (i <- 1 until xs.length) {
        val lNew = 0.5 * xs(i) + 0.5 * (l + b)
        b = 0.25 * (lNew - l) + 0.75 * b
        l = lNew
      }
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(2) - l) < 1e-6, s"level ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - b) < 1e-6, s"trend ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - (l + b)) < 1e-6)
    }
    // synthetic flat series: level == the constant, trend -> 0
    val flat = Array.fill(20)(7.0)
    var l = flat(0); var b = 0.0
    for (i <- 1 until flat.length) {
      val lNew = 0.5 * flat(i) + 0.5 * (l + b)
      b = 0.25 * (lNew - l) + 0.75 * b; l = lNew
    }
    assert(math.abs(l - 7.0) < 1e-9 && math.abs(b) < 1e-9)
  }

  test("bm25: scores match a driver-side computation for one query") {
    val rows = TextFunctions.bm25(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect()
    val tf = docs.map { case (id, t) =>
      id -> t.split("[^a-z0-9]+").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = tf.size.toLong
    val avgdl = tf.values.map(_.values.sum).sum.toDouble / n
    val q0Terms = tf(0L).keys.toSeq.map(t => (df(t), t)).sorted.take(5).map(_._2)
    def score(d: Long): Double = {
      val dlen = tf(d).values.sum.toDouble
      q0Terms.sorted.flatMap { t =>
        tf(d).get(t).map { f =>
          math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
            (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dlen / avgdl))
        }
      }.foldLeft(0.0)(_ + _)
    }
    val expect = tf.keys.filter(_ != 0L).map(d => (d, score(d)))
      .filter(_._2 > 0.0).toSeq.sortBy { case (d, s) => (-s, d) }.take(5)
    val got = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
    assert(got.map(_.getLong(2)).toSeq === expect.map(_._1))
    for ((r, (_, s)) <- got.zip(expect))
      assert(math.abs(r.getDouble(4) - s) < 1e-6)
  }

  test("detector overlap: counts consistent, intersection bounded by both sides") {
    val rows = graft.operators.Dedup.detectorOverlap(spark, sf).collect()
    assert(rows.length === 3)
    for (r <- rows) {
      assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)))
      assert(r.getLong(4) === r.getLong(1) + r.getLong(2) - r.getLong(3))
    }
    // both minhash variants verify with the same exact-jaccard rule, so
    // each of their pair sets is a subset of the full ngram detector's
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val mvn = byName("minhash_vs_ngram")
    assert(mvn.getLong(3) === mvn.getLong(1)) // minhash ⊆ ngram
    val ovn = byName("oph_vs_ngram")
    assert(ovn.getLong(3) === ovn.getLong(1)) // oph ⊆ ngram
  }

  test("intersect all: multiplicity is per-key min of click and view counts") {
    val got = graft.operators.Relational.intersectAllClicks(spark, sf).collect()
      .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length).toMap
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd")).as[(String, Long, String)].collect()
    def bag(t: String) = e.filter(_._1 == t).groupBy(x => (x._2, x._3))
      .view.mapValues(_.length).toMap
    val (clicks, views) = (bag("click"), bag("view"))
    val expect = clicks.flatMap { case (k, c) =>
      val m = math.min(c, views.getOrElse(k, 0)); if (m > 0) Some(k -> m) else None }
    assert(got === expect)
  }

  test("lang confusion: cells partition the corpus; shares sum to 1 per actual") {
    val rows = TextFunctions.langConfusion(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum === total)
    for ((_, rs) <- rows.groupBy(_.getString(0))) {
      assert(rs.map(_.getLong(2)).sum === rs.head.getLong(3))
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    }
  }

  test("centroid drift: cosine matches a driver-side centroid recompute") {
    // NOTE: these embeddings are roughly centered, so cohort centroids
    // are small noise vectors and their cosine is NOT near 1 — the
    // check is exactness vs a recompute, plus the [-1, 1] range
    val rows = graft.operators.Similarity.centroidDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === n)
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
    for (r <- rows) {
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
      val label = r.get(0).toString.toLong
      def cent(par: Long): Array[Double] = {
        val vs = emb.filter(e => e._2 == label && e._1 % 2 == par).map(_._3)
        val dim = vs.head.length
        Array.tabulate(dim)(i => vs.map(_(i).toDouble).sum / vs.length)
      }
      val (a, b) = (cent(0), cent(1))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(r.getDouble(3) - cos) < 1e-5, s"label $label")
    }
  }

  test("doc embedding: integral mean-pool matches a driver recompute; layout invariant") {
    val rows = TextFunctions.docEmbedding(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect().toMap
    def md5bits(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 7), 16)
    }
    for (r <- rows.take(10)) {
      val toks = docs(r.getLong(0)).split("[^a-z0-9]+").filter(_.nonEmpty)
      assert(r.getLong(1) === toks.length.toLong)
      for (i <- 0 until 8) {
        val s = toks.map(t => md5bits(s"${i}_$t") % 1000L).sum
        val expect = math.rint(s.toDouble / toks.length * 1e6) / 1e6
        assert(math.abs(r.getDouble(2 + i) - expect) < 1e-9, s"dim $i doc ${r.getLong(0)}")
      }
    }
  }

  test("overlap join: durations positive, bounded by both intervals, spot-checked") {
    val rows = graft.operators.Temporal.overlapJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val promos = graft.operators.Temporal.promoWindows.map { case (id, s, e) =>
      id.toLong -> (java.sql.Timestamp.valueOf(s), java.sql.Timestamp.valueOf(e))
    }.toMap
    for (r <- rows) {
      val (p0, p1) = promos(r.getLong(2))
      val pLen = (micros(p1) - micros(p0))
      assert(r.getLong(3) > 0L && r.getLong(3) <= pLen)
      // the overlapping day must fall within [promo start - 1d, promo end]
      val d = java.time.LocalDate.parse(r.getString(1))
      assert(!d.isBefore(p0.toLocalDateTime.toLocalDate))
      assert(!d.isAfter(p1.toLocalDateTime.toLocalDate))
    }
  }

  test("constraint audit: FK edges clean, PK violations match a recompute") {
    val rows = graft.operators.Relational.constraintAudit(spark, sf).collect()
    assert(rows.length === 11)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // the synthetic star schema is referentially clean on every FK edge
    for (r <- rows if r.getString(0).endsWith("_fk"))
      assert(r.getLong(2) === 0L, s"${r.getString(0)} violations")
    // single-column PKs are unique; the synthetic lineitem genuinely
    // REUSES (l_orderkey, l_linenumber) — the audit detects it, and the
    // count must equal an independent recompute
    for (n <- Seq("customer_pk", "orders_pk", "part_pk"))
      assert(byName(n).getLong(2) === 0L, s"$n violations")
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val dups = li.count() -
      li.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(byName("lineitem_pk").getLong(2) === dups)
    assert(byName("orders_pk").getLong(1) ===
      graft.sources.Tables.load(spark, sf, "orders").count())
    assert(byName("lineitem_orderkey_fk").getLong(1) === li.count())
  }

  test("contamination pairs: each reported pair really shares >= 3 distinct 8-grams") {
    val rows = TextFunctions.contaminationPairs(spark, sf).collect()
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).as[(Long, String)].collect().toMap
    def grams(id: Long): Set[String] = {
      val w = docs(id).split("[^a-z0-9]+").filter(_.nonEmpty)
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    for (r <- rows) {
      assert(r.getLong(0) % 10 != 0 && r.getLong(1) % 10 == 0)
      val shared = (grams(r.getLong(0)) & grams(r.getLong(1))).size.toLong
      assert(shared === r.getLong(2), s"pair ${r.getLong(0)},${r.getLong(1)}")
      assert(shared >= 3L)
    }
    // completeness: no qualifying pair is missed (driver-side sweep)
    val evals = docs.keys.filter(_ % 10 == 0).toSeq
    val trains = docs.keys.filter(_ % 10 != 0).toSeq
    val evalGrams = evals.map(e => e -> grams(e)).filter(_._2.nonEmpty)
    val reported = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (t <- trains; g = grams(t); if g.nonEmpty; (e, eg) <- evalGrams
         if (g & eg).size >= 3)
      assert(reported.contains((t, e)), s"missed $t,$e")
  }

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L
}
