package graft

import org.apache.spark.sql.functions._
import graft.operators.Fusion
import graft.sources.SchemaAlign

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinFilter keeps only orders of BUILDING customers") {
    val out = Fusion.semiJoinFilter(spark, sf)
    val custs = graft.sources.Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").as[Long].collect().toSet
    val got = out.select("o_custkey").as[Long].collect().toSet
    assert(got.nonEmpty && got.subsetOf(custs))
  }

  test("antiJoin returns customers with no urgent orders") {
    val anti = Fusion.antiJoin(spark, sf).select("c_custkey").as[Long].collect().toSet
    val withUrgent = graft.sources.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").as[Long].collect().toSet
    assert(anti.nonEmpty && anti.intersect(withUrgent).isEmpty)
  }

  test("unionSources carries both lineages with null-filled columns") {
    val u = Fusion.unionSources(spark, sf)
    assert(u.columns.toSet ==
      Set("o_orderkey", "o_totalprice", "o_orderpriority", "source", "o_orderstatus"))
    val bySrc = u.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set("eCollision Oracle", "eCollision Analytics"))
    val total = graft.sources.Tables.load(spark, sf, "orders").count()
    assert(bySrc.values.sum == total)
  }

  test("dedupLatestPerKey keeps exactly one row per key") {
    val d = Fusion.dedupLatestPerKey(spark, sf)
    assert(d.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("samplePerGroup bounds every group at n") {
    val s = Fusion.samplePerGroup(spark, sf, n = 3)
    assert(s.groupBy("o_orderpriority").count()
      .filter(col("count") > 3).count() == 0)
  }

  test("runFusionEtl writes the filtered, derived, projected table") {
    val out = java.nio.file.Files.createTempDirectory("graft-fusion")
      .resolve("fusion_orders").toString
    val n = Fusion.runFusionEtl(spark, sf, out)
    val written = spark.read.parquet(out)
    assert(written.columns.toSeq ==
      Seq("o_orderkey", "case_year", "total_price", "order_datestring", "source"))
    // row count equals orders semi-joined to the valid-user set
    val valid = graft.operators.Validity.validUsersFromDir(spark, sf)
      .select("user_id").as[Long].collect().toSet
    val expect = graft.sources.Tables.load(spark, sf, "orders")
      .filter(col("o_custkey").isin(valid.toSeq: _*)).count()
    assert(n == expect && n > 0)
    assert(written.filter(col("source") =!= "eCollision Oracle").count() == 0)
  }

  test("SQL surface of the validity view matches the DataFrame chain") {
    val sqlRows = graft.sql.GraftSql.validUsers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dfRows = graft.operators.Validity.validUsersFromDir(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(sqlRows == dfRows)
  }

  test("unionLineages aligns differing schemas") {
    val a = Seq((1L, "x")).toDF("id", "a_only")
    val b = Seq((2L, 3.0)).toDF("id", "b_only")
    val u = SchemaAlign.unionLineages(a, b)
    assert(u.columns.toSet == Set("id", "a_only", "b_only"))
    assert(u.count() == 2)
  }
}
