package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-first surface: the reference's analytical heart is a SQL view
  * (/root/reference/create_view_vw_valid_collision_from_oracle.sql);
  * a user migrating from it writes SQL, not Scala. This object
  * registers the engine tables as temp views and exposes the validity
  * chain as ONE Spark SQL statement — same semantics, same oracle, as
  * the DataFrame implementation in operators.Validity.
  */
object GraftSql {

  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  private val cutoffRows =
    graft.operators.Validity.cutoffs
      .map { case (w, t) => s"($w, TIMESTAMP '$t')" }.mkString(", ")

  /** The validity view as executable Spark SQL (CTE chain mirroring the
    * reference's view text, minus its redundant re-ranking passes).
    */
  val validUsersViewSql: String =
    s"""WITH fe AS (
       |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
       |fw AS (
       |  SELECT user_id, first_ts,
       |         CAST(ceil(day(first_ts) / 7.0D) AS INT) AS wk
       |  FROM fe),
       |cut AS (
       |  SELECT * FROM VALUES $cutoffRows AS t(wk, cutoff_ts)),
       |assigned AS (
       |  SELECT fw.user_id, fw.wk, fw.first_ts, cut.cutoff_ts
       |  FROM fw JOIN cut ON fw.wk = cut.wk),
       |ranked AS (
       |  SELECT e.user_id, e.event_type, e.ts, e.event_id,
       |         row_number() OVER (PARTITION BY e.user_id
       |                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
       |  FROM events e JOIN assigned a ON e.user_id = a.user_id
       |  WHERE e.ts <= a.cutoff_ts)
       |SELECT r.user_id, c.c_name
       |FROM ranked r LEFT JOIN customer c ON r.user_id = c.c_custkey
       |WHERE r.rn = 1 AND r.event_type IN ('purchase', 'signup')
       |  AND c.c_name IS NOT NULL
       |ORDER BY c.c_name DESC, r.user_id""".stripMargin

  /** `q_valid_entities_sql` surface. */
  def validUsers(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(validUsersViewSql)
  }

  /** `q_above_avg` surface: scalar subquery in the predicate — Catalyst
    * plans the subquery once (a one-row broadcast), not per row.
    */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** `sim_sql_topk` surface: the brute-force ANN expressed ENTIRELY in
    * SQL through the extension-registered `graft_cosine` function —
    * proof that the custom codegen Expression is a first-class SQL
    * citizen (a BI tool or notebook user gets the same native kernel
    * the Scala API uses). Same plan shape and oracle as
    * `sim_bruteforce_topk`.
    */
  def sqlTopK(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT /*+ BROADCAST(q) */ q.q_id, e.vec_id,
        |             graft_cosine(q.q_emb, e.embedding) AS cos
        |      FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM s)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id,
        |       round(cos, 6) AS cos
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin)
  }

  /** `q_exists_sql` surface: correlated EXISTS in the predicate —
    * Catalyst rewrites it to a LEFT SEMI join (one shuffle, no
    * per-row subquery execution), the SQL spelling of
    * `Fusion.semiJoinFilter`.
    */
  def existsUrgent(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }
}
