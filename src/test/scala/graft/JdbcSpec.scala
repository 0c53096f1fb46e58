package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Ddl, Ingest, Jdbc, JdbcConfig, TableLifecycle, Tables}

/** JDBC surface against embedded Derby — the closest the sandbox gets
  * to the reference's Oracle/MSSQL/PostgreSQL loop. Derby ships with
  * Spark, so the write→read round-trip, the partitioned read, the
  * predicate-split read, and DDL bootstrap are all REAL here, not
  * compile-checked stubs.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(table: String) =
    JdbcConfig("jdbc:derby:memory:graftspec;create=true", table)

  test("write → load round-trips a dimension table losslessly") {
    val nation = Tables.load(spark, sf, "nation")
    Jdbc.write(nation, cfg("nation_full"), mode = SaveMode.Overwrite)
    val back = Jdbc.load(spark, cfg("nation_full"))
    // canonical policy widened the int keys; values must be untouched
    assert(back.schema("n_nationkey").dataType == LongType)
    val a = nation.select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect().toSeq
    val b = back.select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey").collect().toSeq
    assert(a == b)
  }

  test("partitioned read splits into range queries without loss or dup") {
    val nation = Tables.load(spark, sf, "nation")
    Jdbc.write(nation, cfg("nation_part"), mode = SaveMode.Overwrite)
    val back = Jdbc.loadPartitioned(spark, cfg("nation_part"),
      "n_nationkey", lowerBound = 5L, upperBound = 20L, numPartitions = 4)
    // bounds steer split points only — the read must still be complete
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == nation.count())
    assert(back.select(sum(col("n_nationkey"))).as[Long].head() ==
      nation.select(sum(col("n_nationkey").cast("long"))).as[Long].head())
  }

  test("predicate-split read tiles the table disjointly") {
    // identifiers quoted: Spark's JDBC writer created case-preserving
    // quoted columns, so the raw predicate must quote them too
    val back = Jdbc.loadByPredicates(spark, cfg("nation_part"),
      Seq("\"n_regionkey\" < 2", "\"n_regionkey\" >= 2"))
    assert(back.rdd.getNumPartitions == 2)
    assert(back.count() == Tables.load(spark, sf, "nation").count())
  }

  test("dialect policies express the reference type maps") {
    // Oracle NUMBER(p) → long, NUMBER(p,s) stays exact decimal,
    // BINARY_FLOAT → double (map_oracle_to_postgres rows)
    val oracleish = spark.range(1).select(
      col("id").cast(DecimalType(10, 0)).as("pk"),
      col("id").cast(DecimalType(12, 2)).as("amount"),
      col("id").cast(FloatType).as("score"))
    val o = Jdbc.fromOracle(oracleish)
    assert(o.schema("pk").dataType == LongType)
    assert(o.schema("amount").dataType == DecimalType(12, 2))
    assert(o.schema("score").dataType == DoubleType)
    // MSSQL int/smallint/tinyint → long, real → double, bit stays boolean
    val mssqlish = spark.range(1).select(
      col("id").cast(IntegerType).as("n"),
      col("id").cast(ShortType).as("s"),
      col("id").cast(FloatType).as("r"),
      (col("id") === 0).as("flag"))
    val m = Jdbc.fromMsSql(mssqlish)
    assert(m.schema("n").dataType == LongType)
    assert(m.schema("s").dataType == LongType)
    assert(m.schema("r").dataType == DoubleType)
    assert(m.schema("flag").dataType == BooleanType)
  }

  test("ddl bootstrap round-trips a schema through a real database") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("n", IntegerType),
      StructField("ok", BooleanType)))
    val lc = TableLifecycle(prefix = "fusion_", devMode = true,
      dropExisting = false)
    assert(lc.physicalName("trips") == "fusion_trips_dev")
    val stmts = lc.bootstrapSql("trips", schema, Ddl.Derby,
      primaryKey = Some("id"))
    // the Derby dialect owns the existence clause (no IF NOT EXISTS),
    // so the emitted DDL executes VERBATIM on its declared target
    assert(!stmts.exists(_.contains("IF NOT EXISTS")))
    val conn = DriverManager.getConnection(
      "jdbc:derby:memory:graftspec;create=true")
    try {
      stmts.foreach { s =>
        val st = conn.createStatement()
        try st.execute(s)
        finally st.close()
      }
      // the created table accepts a write through the JDBC sink and
      // surfaces the SOURCE lineage column the bootstrap appended
      val rows = Seq((1L, "a", 1.5, 7, true, "eCollision Oracle"))
        .toDF("id", "name", "score", "n", "ok", "source")
      Jdbc.write(rows, cfg("fusion_trips_dev"), mode = SaveMode.Append)
      val back = Jdbc.load(spark, cfg("fusion_trips_dev"))
      assert(back.columns.toSeq ==
        Seq("id", "name", "score", "n", "ok", "source"))
      assert(back.count() == 1L)
    } finally conn.close()
  }

  test("dropExisting lifecycle emits drop-then-create") {
    val lc = TableLifecycle(dropExisting = true)
    val stmts = lc.bootstrapSql("t",
      StructType(Seq(StructField("id", LongType))), Ddl.Postgres)
    assert(stmts.head == "DROP TABLE IF EXISTS fusion_t")
    assert(stmts(1).startsWith("CREATE TABLE fusion_t ("))
    // identifiers come out quoted — matching the case-preserving quoted
    // columns Spark's own JDBC writer creates
    assert(stmts(1).contains("\"source\" TEXT"))
    assert(stmts(1).contains("\"id\" BIGINT"))
    // Derby path: no conditional DROP exists there, plain DROP is emitted
    val derby = TableLifecycle(dropExisting = true)
      .bootstrapSql("t", StructType(Seq(StructField("id", LongType))),
        Ddl.Derby)
    assert(derby.head == "DROP TABLE fusion_t")
  }

  test("reserved-word column bootstraps and round-trips through Derby") {
    // a column named `order` is only valid DDL because the dialect
    // quotes identifiers — the r5 ADVICE gap
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("order", IntegerType)))
    val ddl = Ddl.createTable("reserved_t", schema, Ddl.Derby,
      primaryKey = Some("id"))
    assert(ddl.contains("\"order\" INTEGER"))
    val conn = DriverManager.getConnection(
      "jdbc:derby:memory:graftspec;create=true")
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } finally conn.close()
    val rows = Seq((1L, 10), (2L, 20)).toDF("id", "order")
    Jdbc.write(rows, cfg("reserved_t"), mode = SaveMode.Append)
    val back = Jdbc.load(spark, cfg("reserved_t"))
    assert(back.columns.toSeq == Seq("id", "order"))
    assert(back.orderBy("id").select(sum(col("order"))).as[Long].head() == 30L)
  }

  test("bounded load pushes the row limit into the source database") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Jdbc.write(orders, cfg("orders_bounded"), mode = SaveMode.Overwrite)
    val bounded = Jdbc.load(spark, cfg("orders_bounded"), limit = Some(12))
    // the bound reaches Derby as FETCH FIRST inside the generated
    // relation — n rows cross the wire, not the table
    val rel = bounded.queryExecution.analyzed.toString
    assert(rel.contains("FETCH FIRST 12 ROWS ONLY"), rel)
    assert(bounded.count() == 12L)
    // a bound past the table size degrades to the complete read
    assert(Jdbc.load(spark, cfg("orders_bounded"),
      limit = Some(10000000)).count() == orders.count())
  }

  test("keyed upsert applies a change feed and matches q_merge") {
    import graft.operators.Fusion
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_totalprice"), col("o_orderstatus"))
    Jdbc.write(o, cfg("merge_target"), mode = SaveMode.Overwrite)
    // the same deterministic feed q_merge derives (update %7, delete
    // %11, insert %13 shifted), carried as full replacement rows + flag
    val feed = o
      .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 100.0).as("o_totalprice"),
        col("o_orderstatus"),
        (col("o_orderkey") % 11 === 0).as("is_delete"))
      .unionByName(o.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
          col("o_totalprice"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(false).as("is_delete")))
    Jdbc.upsert(feed, cfg("merge_target"), keys = Seq("o_orderkey"),
      deleteFlag = Some("is_delete"), batchSize = 50)
    val applied = Jdbc.load(spark, cfg("merge_target"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderstatus").as("status"))
      .orderBy("o_orderkey").collect().toSeq
    val expected = Fusion.mergeChanges(spark, sf)
      .select(col("o_orderkey").cast("long"), col("price"), col("status"))
      .orderBy("o_orderkey").collect().toSeq
    assert(applied.size == expected.size)
    assert(applied == expected)
  }

  test("upsert mode dispatch and dialect-native statement shapes") {
    import Jdbc.UpsertMode
    // URL dispatch: native single-statement modes for recognized
    // targets, portable DELETE+INSERT for everything else (Derby).
    assert(UpsertMode.fromUrl("jdbc:postgresql://h/db") ==
      UpsertMode.PostgresOnConflict)
    assert(UpsertMode.fromUrl("jdbc:oracle:thin:@h:1521/s") ==
      UpsertMode.OracleMerge)
    assert(UpsertMode.fromUrl("jdbc:sqlserver://h;db=x") ==
      UpsertMode.MsSqlMerge)
    assert(UpsertMode.fromUrl("jdbc:derby:memory:x") == UpsertMode.Portable)

    val keys = Seq("id")
    val cols = Seq("id", "price", "status")
    val (pg, pgBind) =
      UpsertMode.PostgresOnConflict.statement("ords", keys, cols)
    assert(pg == """INSERT INTO ords ("id", "price", "status")""" +
      """ VALUES (?, ?, ?)""" +
      """ ON CONFLICT ("id") DO UPDATE SET "price" = EXCLUDED."price",""" +
      """ "status" = EXCLUDED."status"""")
    assert(pgBind == cols)

    val (ora, oraBind) = UpsertMode.OracleMerge.statement("ords", keys, cols)
    assert(ora == """MERGE INTO ords t USING""" +
      """ (SELECT ? AS "id", ? AS "price", ? AS "status" FROM dual) s""" +
      """ ON (t."id" = s."id")""" +
      """ WHEN MATCHED THEN UPDATE SET t."price" = s."price",""" +
      """ t."status" = s."status"""" +
      """ WHEN NOT MATCHED THEN INSERT ("id", "price", "status")""" +
      """ VALUES (s."id", s."price", s."status")""")
    assert(oraBind == cols)

    val (ms, msBind) = UpsertMode.MsSqlMerge.statement("ords", keys, cols)
    assert(ms == """MERGE INTO ords WITH (HOLDLOCK) AS t USING""" +
      """ (VALUES (?, ?, ?)) AS s ("id", "price", "status")""" +
      """ ON t."id" = s."id"""" +
      """ WHEN MATCHED THEN UPDATE SET t."price" = s."price",""" +
      """ t."status" = s."status"""" +
      """ WHEN NOT MATCHED THEN INSERT ("id", "price", "status")""" +
      """ VALUES (s."id", s."price", s."status");""")
    assert(msBind == cols)

    // key-only feeds degrade gracefully: no empty SET clauses
    val (pgK, _) = UpsertMode.PostgresOnConflict.statement("ords", keys, keys)
    assert(pgK.endsWith("DO NOTHING"))
    val (oraK, _) = UpsertMode.OracleMerge.statement("ords", keys, keys)
    assert(!oraK.contains("WHEN MATCHED") && oraK.contains("WHEN NOT MATCHED"))
  }

  test("upsert in portable mode is explicit and Derby-executable") {
    // Forcing mode=Portable against Derby must behave exactly like the
    // dispatch default (Derby URL → Portable): same feed, same result.
    val o = Tables.load(spark, sf, "orders").limit(20)
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_totalprice"))
    Jdbc.write(o, cfg("portable_target"), mode = SaveMode.Overwrite)
    val feed = o.limit(5)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
        lit(false).as("is_delete"))
    Jdbc.upsert(feed, cfg("portable_target"), keys = Seq("o_orderkey"),
      deleteFlag = Some("is_delete"),
      mode = Some(Jdbc.UpsertMode.Portable))
    val doubled = Jdbc.load(spark, cfg("portable_target"))
      .join(feed.select(col("o_orderkey").as("k")),
        col("o_orderkey") === col("k"))
      .count()
    assert(doubled == 5)
  }

  test("native upsert candidate is demoted to Portable when the key " +
      "has no unique index") {
    import Jdbc.UpsertMode
    // key-LESS table — what Spark's JDBC writer and Ddl.createTable
    // without primaryKey produce; Postgres ON CONFLICT would throw on
    // it, so the resolver must demote the native candidate
    val o = Tables.load(spark, sf, "orders").limit(20)
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_totalprice"))
    Jdbc.write(o, cfg("keyless_target"), mode = SaveMode.Overwrite)
    assert(Jdbc.verifiedMode(cfg("keyless_target"), Seq("o_orderkey"),
      UpsertMode.PostgresOnConflict) == UpsertMode.Portable)
    // keyED table (PRIMARY KEY via Ddl bootstrap): candidate survives
    val ddl = Ddl.createTable("keyed_target",
      StructType(Seq(
        StructField("o_orderkey", LongType, nullable = false),
        StructField("o_totalprice", DoubleType))),
      Ddl.Derby, primaryKey = Some("o_orderkey"))
    val conn = DriverManager.getConnection(
      "jdbc:derby:memory:graftspec;create=true")
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
      assert(Jdbc.hasUniqueKeyIndex(conn, "keyed_target", Seq("o_orderkey")))
      assert(!Jdbc.hasUniqueKeyIndex(conn, "keyed_target",
        Seq("o_totalprice")))
    } finally conn.close()
    assert(Jdbc.verifiedMode(cfg("keyed_target"), Seq("o_orderkey"),
      UpsertMode.PostgresOnConflict) == UpsertMode.PostgresOnConflict)
    // and the end-to-end default path on the key-less table SUCCEEDS
    // (r8 ADVICE medium's done-criterion): dispatch → probe → Portable
    val feed = o.limit(5)
      .select(col("o_orderkey"), (col("o_totalprice") * 3).as("o_totalprice"))
    Jdbc.upsert(feed, cfg("keyless_target"), keys = Seq("o_orderkey"))
    assert(Jdbc.load(spark, cfg("keyless_target")).count() == 20L)
  }

  test("jdbc round-trip query equals the source table") {
    val rt = Ingest.jdbcRoundtrip(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().toSeq
    val src = Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .orderBy("n_nationkey").collect().toSeq
    assert(rt == src)
  }

  test("catalogColumns introspects a live table through DatabaseMetaData") {
    val nation = Tables.load(spark, sf, "nation")
    Jdbc.write(nation, cfg("nation_cat"), mode = SaveMode.Overwrite)
    val cols = Jdbc.catalogColumns(spark, cfg("nation_cat"), "nation_cat")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(5)))
    // Spark's Derby writer quotes column names, preserving case
    assert(cols.map(_._2).toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(cols.forall(_._3 == "YES"))
    assert(cols.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("ddlColumns agrees with the ANSI dialect over every footer") {
    val d = Ddl.ddlColumns(spark, sf, Seq("region", "orders"))
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(d.contains(("region", "r_regionkey", "INTEGER")) ||
      d.contains(("region", "r_regionkey", "BIGINT")))
    assert(d.exists(t => t._1 == "orders" && t._3 == "TIMESTAMP"))
    assert(d.exists(t => t._1 == "orders" && t._3 == "DOUBLE"))
  }

  test("two-epoch high-watermark incremental: new + updated rows land " +
    "exactly once via upsert") {
    val url = "jdbc:derby:memory:graftincr;create=true"
    val src = JdbcConfig(url, "incr_src")
    val dst = JdbcConfig(url, "incr_dst")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val v1 = Seq(
      (1L, "alpha", 10.0, ts("2024-01-01 00:00:00")),
      (2L, "beta", 20.0, ts("2024-01-02 00:00:00")))
      .toDF("id", "name", "amt", "mod_ts")
    Jdbc.write(v1, src, mode = SaveMode.Overwrite)

    // epoch 1: bootstrap pull lands everything; watermark recorded
    val pull1 = Jdbc.loadIncremental(spark, src, "mod_ts", None)
    assert(pull1.count() == 2)
    Jdbc.write(pull1, dst, mode = SaveMode.Overwrite)
    val wm1 = Jdbc.maxWatermark(src, "mod_ts").get
    assert(wm1 == ts("2024-01-02 00:00:00"))
    // an immediate re-pull past the watermark is EMPTY (idempotence)
    assert(Jdbc.loadIncremental(spark, src, "mod_ts", Some(wm1)).count() == 0)

    // the source evolves: row 2 UPDATED in place (watermark advances),
    // row 3 INSERTED
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        st.executeUpdate("""UPDATE incr_src SET "amt" = 21.5,
          "mod_ts" = {ts '2024-01-03 00:00:00'} WHERE "id" = 2"""): Unit
        st.executeUpdate("""INSERT INTO incr_src VALUES
          (3, 'gamma', 30.0, {ts '2024-01-04 00:00:00'})"""): Unit
      } finally st.close()
    } finally conn.close()

    // epoch 2: only the delta crosses; upsert replaces + inserts
    val pull2 = Jdbc.loadIncremental(spark, src, "mod_ts", Some(wm1))
    assert(pull2.count() == 2)
    Jdbc.upsert(pull2, dst, keys = Seq("id"))
    val fin = Jdbc.load(spark, dst)
      .select(col("id"), col("name"), col("amt"), col("mod_ts"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(fin == Seq((1L, "alpha", 10.0), (2L, "beta", 21.5),
      (3L, "gamma", 30.0)), s"got $fin")

    // epoch 3 from the new watermark: nothing new, nothing re-landed
    val wm2 = Jdbc.maxWatermark(src, "mod_ts").get
    assert(Jdbc.loadIncremental(spark, src, "mod_ts", Some(wm2)).count() == 0)
  }
}
