package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for CPU-heavy per-row kernels
  * (round 16, guide §2: derive partitioning from the input, never a
  * constant tuned for one deployment).
  *
  * The gate corpora are single-row-group parquet files, so their scans
  * are UNSPLITTABLE — one task runs the whole shingle/signature/token
  * kernel while the other cores idle (profiled at sf0.1: the
  * ngram-jaccard shingle stage 1.46 s on one task of a 32-core
  * session). A real 100 TB table scans as thousands of splits, so a
  * fixed repartition would be pure overhead there. This helper closes
  * exactly that gap and nothing else: when the frame carries FEWER
  * partitions than the session's default parallelism it hash-spreads
  * rows by a unique key to the default parallelism; otherwise it is a
  * no-op (zero added shuffles at scale).
  *
  * Correctness: every graft operator is partition-layout independent
  * by contract (LayoutSoak + the layout-invariance specs; survivor
  * draws are md5-keyed, orderings fully tie-broken), and the helpers
  * that DO observe physical layout (Prefix, batchPack, shardPack)
  * establish their own partitioning downstream of any Spread.
  *
  * Contract: call ONLY on exchange-free frames — a bare table scan or
  * a Stabilized (checkpointed) frame. On those `.rdd.getNumPartitions`
  * is a plan-only computation (file splits / checkpoint blocks); on a
  * frame WITH exchanges the same call would force AQE to execute the
  * upstream stages, running the plan twice.
  */
object Spread {

  /** Env kill-switch (dev A/B + escape hatch): SPARK_GRAFT_SPREAD=0
    * makes every Spread the identity.
    */
  private val enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_SPREAD").contains("0")

  def apply(df: DataFrame, key: Column): DataFrame = {
    if (!enabled) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p, key)
  }
}
