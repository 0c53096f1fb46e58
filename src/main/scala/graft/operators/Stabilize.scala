package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization with truncated lineage for multi-consumer
  * intermediates (the prefix-sum family, iterative label propagation,
  * multi-cut aggregate reuse).
  *
  * Default = `localCheckpoint(eager = true)`: no CacheManager entry
  * (nothing pinned for the session), blocks reference-counted away by
  * the ContextCleaner, and — unlike a recompute — a nondeterministic
  * column (spark_partition_id, monotonically_increasing_id) is
  * observed exactly once. The trade: localCheckpoint blocks are
  * NON-REPLICATED, so on a real cluster losing one executor (failure
  * or dynamic-allocation decommission) mid-query fails the query
  * instead of recomputing.
  *
  * Deployments running with spot executors or dynamic allocation set
  * `spark.graft.reliableCheckpointDir` (an HDFS/object-store path):
  * the same call sites then write RELIABLE checkpoint files there —
  * recoverable after executor loss, same plan shape, at the cost of a
  * distributed write per stabilization.
  *
  * Checkpoint-file growth: Spark only deletes reliable checkpoint
  * files while the app runs if `spark.cleaner.referenceTracking
  * .cleanCheckpoints=true` was set at LAUNCH (a core conf the
  * ContextCleaner reads at construction — it cannot be flipped from
  * inside a session); long-lived sessions with iterative callers
  * (label propagation stabilizes once per iteration) should launch
  * with it. Independent of that, `setCheckpointDir` namespaces the
  * files under a per-application UUID subdirectory, and Stabilize
  * registers an application-end listener that deletes that
  * subdirectory — so a finished (even crashed-driver-JVM-exit)
  * application never strands its checkpoint data; only a hard-killed
  * driver can, and those orphans are identifiable by UUID dir mtime.
  */
object Stabilize {

  val ConfKey = "spark.graft.reliableCheckpointDir"

  // Guards one-time listener registration per SparkContext.
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register end-of-application deletion for `dir` — called ONLY with
    * the UUID subdirectory Stabilize itself created via
    * `setCheckpointDir`. A checkpoint dir the CALLER set before the
    * first Stabilize call is caller-owned state (it may hold
    * checkpoints from other subsystems) and is never deleted here
    * (r8 ADVICE low).
    */
  private def registerCleanup(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val sc = spark.sparkContext
    if (cleanupRegistered.add(sc.applicationId)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          try {
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
          } catch { case _: Throwable => /* best effort */ }
      })
    }
  }

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          spark.sparkContext.setCheckpointDir(dir)
          // getCheckpointDir is now the per-app UUID subdir we created.
          spark.sparkContext.getCheckpointDir
            .foreach(registerCleanup(spark, _))
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
