package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Validity

class ValiditySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: first event Jan 3 (wk 1, cutoff Jan 21); last event at/before
  //   cutoff is purchase on Jan 20 → valid.
  // user 2: first event Jan 23 (wk 4, cutoff Jan 31); last at cutoff is
  //   error → invalid.
  // user 3: single click event before its cutoff → last-at-cutoff is
  //   click → invalid.
  private lazy val events = Seq(
    (1L, ts("2024-01-03 10:00:00"), "click", 10L),
    (1L, ts("2024-01-20 10:00:00"), "purchase", 11L),
    (1L, ts("2024-01-22 10:00:00"), "error", 12L), // after cutoff, ignored
    (2L, ts("2024-01-23 10:00:00"), "purchase", 20L),
    (2L, ts("2024-01-30 10:00:00"), "error", 21L),
    (3L, ts("2024-01-03 09:00:00"), "click", 30L)
  ).toDF("user_id", "ts", "event_type", "event_id")

  private lazy val customer = Seq(
    (1L, "Customer#1"), (2L, "Customer#2"), (3L, "Customer#3")
  ).toDF("c_custkey", "c_name")

  test("firstEvent assigns week-of-month buckets") {
    val fe = Validity.firstEvent(events).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(fe == Map(1L -> 1, 2L -> 4, 3L -> 1))
  }

  test("statusAtCutoff keeps the latest event at-or-before the cutoff") {
    val at = Validity.statusAtCutoff(spark, events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("last_type")).toMap
    assert(at == Map(1L -> "purchase", 2L -> "error", 3L -> "click"))
  }

  test("validUsers keeps only whitelisted status with known names") {
    val v = Validity.validUsers(spark, events, customer).collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("validUsers drops entities missing from the entity table") {
    val v = Validity.validUsers(spark, events,
      customer.filter(col("c_custkey") =!= 1L)).collect()
    assert(v.isEmpty)
  }

  test("full chain runs on the sf0.001 tables") {
    assert(Validity.validUsersFromDir(spark, sf).count() > 0)
  }
}
