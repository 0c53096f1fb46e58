package graft.sources.v2

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSourceV2 batch WRITE path (`graft-stats`): the sink-side
  * twin of `graft-docgen`. Executors stream rows through per-partition
  * `DataWriter`s that fold ONLY a (rows, bytes-ish) accumulator — no
  * buffering — and ship it back as a `WriterCommitMessage`; the driver
  * `BatchWrite.commit` merges the messages into a named entry in
  * `StatsSink.results`. That is exactly the commit-protocol shape a
  * real distributed sink uses (files written per task, manifest
  * committed once, `abort` discards), exercised end to end without
  * touching disk — the profiling/row-count "dry-run sink" a pipeline
  * runs before a 100 TB write to validate volume and skew (per-
  * partition counts expose imbalance before any bytes land).
  *
  * Reference analog: the batched INSERT loop + final commit of
  * helper_db_operation.py's copy path, inverted into Spark's
  * task-commit/job-commit protocol.
  */
class StatsSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stats"
  // write-only source: the table takes whatever schema the data has
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsSinkTable(schema, properties.getOrDefault("name", "default"))
}

object StatsSink {
  /** One entry per named write: (row count, total string-ish bytes,
    * per-partition row counts) — the per-partition vector is the skew
    * diagnostic.
    */
  final case class WriteStats(rows: Long, bytes: Long, partitionRows: Seq[Long])
  val results = new ConcurrentHashMap[String, WriteStats]()
}

class StatsSinkTable(schema: StructType, name: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_stats_$name"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StatsBatchWrite(name, info.schema())
      }
    }
}

final case class StatsCommit(partitionId: Int, rows: Long, bytes: Long)
  extends WriterCommitMessage

class StatsBatchWrite(name: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StatsWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.map(_.asInstanceOf[StatsCommit]).sortBy(_.partitionId)
    StatsSink.results.put(name, StatsSink.WriteStats(
      commits.map(_.rows).sum, commits.map(_.bytes).sum,
      commits.map(_.rows).toSeq))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class StatsWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // cheap volume proxy: fixed-width row size from the schema
        bytes += schema.defaultSize
      }
      override def commit(): WriterCommitMessage = StatsCommit(partitionId, rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
