package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 batch source (`graft-docgen`): a deterministic
  * distributed document generator —
  * `spark.read.format("graft-docgen").option("rows", N)
  * .option("partitions", P)` — the synthetic-corpus twin of the
  * reference's bounded sample ingest, and the load-generation tool a
  * 100 TB pipeline uses to soak-test itself before real data arrives.
  *
  * The V2 surface is exercised end to end: `TableProvider` →
  * `SupportsRead` table → `ScanBuilder` with
  * `SupportsPushDownRequiredColumns` (a projection of (doc_id, source)
  * never materializes text — the generator consults the PRUNED schema
  * per row) → `Batch.planInputPartitions` splitting the id range into
  * P independent splits → a `PartitionReader` streaming rows with no
  * per-partition buffering. Every generated value is a closed-form
  * function of the row id, so the whole source replays in SQL (the
  * DuckDB oracle rebuilds the corpus from range(N)) and any two scans
  * — different partition counts included — agree bit-for-bit.
  */
class DocGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable
}

object DocGen {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def nWords(id: Long): Int = (5 + id % 20).toInt
  def sourceOf(id: Long): String = "gen" + (id % 10)

  /** Token i of doc id is `w<(id·2654435761 + i·40503) mod 1000>` —
    * Knuth multiplicative hash arithmetic, exactly reproducible as
    * BIGINT math in any SQL engine.
    */
  def text(id: Long): String = {
    val n = nWords(id)
    val sb = new StringBuilder
    var i = 0L
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append('w').append((id * 2654435761L + i * 40503L) % 1000L)
      i += 1
    }
    sb.toString
  }
}

class DocGenTable extends Table with SupportsRead {
  override def name(): String = "graft_docgen"
  override def schema(): StructType = DocGen.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(options.getLong("rows", 1000L),
      options.getInt("partitions", 4),
      options.getLong("rowsPerBatch", 100L))
}

/** `doc_id` range predicates are pushed INTO the generator
  * (`SupportsPushDownFilters`): >=, >, <, <=, = clamp the id range
  * before `planInputPartitions`, so a tight filter over a huge logical
  * table generates only the surviving slice — the DSv2 analog of
  * parquet row-group pruning. Consumed filters are exact (integral
  * bounds on the row id itself), so they are NOT re-evaluated post-scan.
  */
class DocGenScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = DocGen.fullSchema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  /** COUNT(*) (no grouping) is answered from the id-range METADATA —
    * the scan emits one long and generates zero documents, the DSv2
    * analog of parquet's rowCount-from-footer count path. Partial
    * pushdown (`supportCompletePushDown` false would re-aggregate)
    * isn't needed: the range is exact, so the pushdown is complete.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    val ok = aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countPushed = true
    ok
  }
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", v: Long)             => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("doc_id", v: Long)         => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long)  => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long)            => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long)     => hi = math.min(hi, v + 1); true
      case _                                      => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countPushed) new DocGenCountScan(math.max(0L, math.max(lo, hi) - lo))
    else new DocGenScan(lo, math.max(lo, hi), parts, required, rowsPerBatch)
}

/** Metadata-only COUNT(*) scan: one partition, one row, zero text
  * generation — `count` is computed from the (filter-clamped) id range.
  */
class DocGenCountScan(count: Long) extends Scan with Batch {
  private val schema = StructType(Seq(StructField("count", LongType, nullable = false)))
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-docgen COUNT pushdown n=$count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenCountReaderFactory(count)
}

class DocGenCountReaderFactory(count: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow(count)
      override def close(): Unit = ()
    }
}

class DocGenScan(lo: Long, hi: Long, parts: Int, required: StructType,
    rowsPerBatch: Long = 100L) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new DocGenMicroBatchStream(lo, hi, parts, required, rowsPerBatch)
  override def description(): String =
    s"graft-docgen range=[$lo,$hi) parts=$parts cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    val per = math.max(1L, (span + parts - 1) / parts.toLong)
    (0 until parts).flatMap { p =>
      val s = lo + p * per
      val e = math.min(hi, lo + (p + 1) * per)
      if (s < e) Some(DocGenPartition(s, e): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

case class DocGenPartition(start: Long, end: Long) extends InputPartition

/** Streaming surface of the same generator
  * (`spark.readStream.format("graft-docgen")`): a bounded
  * `MicroBatchStream` whose offset is simply the count of ids emitted
  * so far — each trigger advances by `rowsPerBatch` until the logical
  * table is exhausted, and `planInputPartitions(start, end)` re-uses
  * the batch range-split. Offsets are pure row counts, so restart
  * from a checkpoint resumes EXACTLY-once with no source-side state
  * beyond the committed offset — the property a replayable ingest
  * feed (Kafka with deterministic payloads, a ledger of file chunks)
  * must expose, demonstrated with closed-form content.
  */
class DocGenMicroBatchStream(lo: Long, hi: Long, parts: Int,
    required: StructType, rowsPerBatch: Long)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl {
  private case class DocGenOffset(pos: Long) extends streaming.Offset {
    override def json(): String = pos.toString
  }
  private var available: Long = lo

  override def initialOffset(): streaming.Offset = DocGenOffset(lo)
  override def deserializeOffset(json: String): streaming.Offset =
    DocGenOffset(json.toLong)
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.allAvailable()
  /** Admission-controlled offset advance: progress is tracked relative
    * to the RESTART point. A fresh stream instance recovering from a
    * checkpoint receives the committed offset as `start` and advances
    * from there — never below it — so no committed range is ever
    * re-planned (exactly-once across restarts, not just within a run).
    */
  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    available = math.max(available, start.json().toLong)
    val cap = limit match {
      case r: streaming.ReadMaxRows => math.min(rowsPerBatch, r.maxRows())
      case _                        => rowsPerBatch
    }
    // guarded add: a huge cap must clamp to hi, not overflow
    available = if (cap >= hi - available) hi else available + cap
    DocGenOffset(available)
  }
  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")
  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val (s0, e0) = (start.json().toLong, end.json().toLong)
    val span = e0 - s0
    if (span <= 0) return Array.empty
    val per = math.max(1L, (span + parts - 1) / parts.toLong)
    (0 until parts).flatMap { p =>
      val s = s0 + p * per
      val e = math.min(e0, s0 + (p + 1) * per)
      if (s < e) Some(DocGenPartition(s, e): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

class DocGenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(
        required.fields.toSeq.map(_.name match {
          case "doc_id"  => id
          case "source"  => UTF8String.fromString(DocGen.sourceOf(id))
          case "n_words" => DocGen.nWords(id)
          case "text"    => UTF8String.fromString(DocGen.text(id))
        }))
      override def close(): Unit = ()
    }
  }
}
