package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executor-loss resilience harness: runs under a REAL multi-JVM
  * master (local-cluster[2,1,1024] by default — two executor
  * processes, each its own JVM), SIGKILLs every executor of the
  * running app between jobs, and proves three properties the 100 TB
  * posture depends on:
  *
  *   1. `plain_recovered` — a lineage-backed query recomputes through
  *      executor loss (the standalone master relaunches executors and
  *      tasks reschedule).
  *   2. `local_ckpt_failed_after_loss` — a `localCheckpoint` frame
  *      does NOT survive: its blocks are unreplicated executor state
  *      and its lineage is truncated, so the recount throws. This is
  *      the documented trade in [[graft.operators.Stabilize]], here
  *      demonstrated rather than asserted.
  *   3. `reliable_recovered` — with `spark.graft.reliableCheckpointDir`
  *      set, the SAME call site (`Stabilize(df)`) recounts correctly
  *      after every executor that materialized it is gone, because the
  *      checkpoint lives in the shared filesystem, not executor memory.
  *
  * Emits one `key=value` marker line per property; exits non-zero if
  * any property fails. ExecutorLossSpec drives it as a subprocess (a
  * local-cluster context cannot coexist with the suite's shared
  * local[4] context in one JVM).
  */
object Chaos {

  private def killAllExecutors(appId: String): Unit = {
    // SIGKILL (not a graceful decommission) every executor backend of
    // THIS app only — the pattern pins both the backend class and the
    // app id so concurrent Spark sessions on the host are untouched.
    val cmd = Seq("pkill", "-9", "-f",
      s"CoarseGrainedExecutorBackend.*--app-id $appId")
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor(): Unit
  }

  def main(args: Array[String]): Unit = {
    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,1,1024]")
    val spark = GraftSession.builder(master = master, shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val appId = sc.applicationId

    // Block count includes the driver; wait for n live executors.
    def liveExecutors(): Int = sc.getExecutorMemoryStatus.size - 1
    def awaitExecutors(n: Int, timeoutMs: Long = 90000): Unit = {
      val t0 = System.currentTimeMillis()
      while (liveExecutors() < n) {
        if (System.currentTimeMillis() - t0 > timeoutMs)
          sys.error(s"timed out waiting for $n executors (have ${liveExecutors()})")
        Thread.sleep(500)
      }
    }
    awaitExecutors(2)

    // 16 partitions across 2 executors so every kill loses real blocks.
    def base: DataFrame =
      spark.range(0, 1000000, 1, 16).toDF("id")
        .withColumn("v", col("id") % 97)

    var ok = true
    def check(name: String, passed: Boolean): Unit = {
      println(s"$name=$passed")
      ok &= passed
    }

    // 1. plain recompute: kill every executor between two runs of the
    // same lineage-backed aggregation; the second run must still answer.
    val expect = base.agg(sum(col("v"))).head().getLong(0)
    killAllExecutors(appId)
    Thread.sleep(2000) // let the driver notice before polling liveness
    awaitExecutors(1)
    val again = base.agg(sum(col("v"))).head().getLong(0)
    check("plain_recovered", again == expect)

    // 2. localCheckpoint: blocks die with the executors, lineage is
    // truncated — the recount MUST fail (if it ever starts succeeding,
    // Spark's storage contract changed and Stabilize's doc is stale).
    awaitExecutors(2)
    val localCk = base.localCheckpoint(true)
    check("local_ckpt_ok_before", localCk.count() == 1000000L)
    killAllExecutors(appId)
    Thread.sleep(2000)
    awaitExecutors(1)
    val failed =
      try { localCk.count(); false }
      catch { case _: Throwable => true }
    check("local_ckpt_failed_after_loss", failed)

    // 3. reliable checkpoint through the SAME Stabilize call site:
    // files in the shared dir outlive every executor that wrote them.
    awaitExecutors(2)
    spark.conf.set(graft.operators.Stabilize.ConfKey, "/tmp/graft_chaos_ckpt")
    val reliable = graft.operators.Stabilize(base)
    check("reliable_ok_before", reliable.count() == 1000000L)
    killAllExecutors(appId)
    Thread.sleep(2000)
    awaitExecutors(1)
    val recount =
      try reliable.count()
      catch { case e: Throwable =>
        System.err.println(s"[chaos] reliable recount threw: ${e.getMessage}")
        -1L
      }
    check("reliable_recovered", recount == 1000000L)

    spark.stop()
    if (!ok) sys.exit(1)
  }
}
