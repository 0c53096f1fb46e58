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
  */
object Stabilize {

  val ConfKey = "spark.graft.reliableCheckpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
