package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Batch DataSource V2 generator — the batch twin of the reference's
  * in-memory generator ramps (`examples/ramps.py:13-50`,
  * `tests/sample_pipeline.py:8-38`), built to exercise the FULL
  * connector pushdown surface a production source (Kinesis archive,
  * queue snapshot, change-log table) would implement:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize only the projected fields — a `select(count)` never
  *    builds the string payload.
  *  - **Filter pushdown → partition pruning**
  *    (`SupportsPushDownFilters`): range predicates on the ordered `id`
  *    column are accepted and used to SKIP whole input partitions whose
  *    id-range can't match (≙ shard/time-range pruning on a real
  *    stream archive). Residual evaluation is also applied per row, so
  *    accepted filters are exact, not best-effort.
  *
  * Rows are deterministic functions of `id` (hash-derived), so results
  * are reproducible across runs and partition counts — the property
  * that makes generated benchmarks auditable.
  *
  * {{{
  * spark.read.format("graft.sources.GenSource")
  *   .option("rows", "100000").option("partitions", "8").load()
  * }}}
  * Schema: id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,
  * value DOUBLE.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object GenSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] = Array("view", "click", "purchase", "refund")
  val EpochUs: Long = 1704067200L * 1000000L // 2024-01-01T00:00:00Z

  /** Deterministic row attributes derived from id (splitmix-style mix). */
  def mix(id: Long): Long = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // instrumentation for specs: the most recent planInputPartitions
  // outcome (the engine may plan a scan more than once per query)
  @volatile var plannedPartitions: Int = 0
  @volatile var prunedPartitions: Int = 0
}

private[sources] class GenTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, partitions)
}

private[sources] class GenScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GenSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept range/equality filters on `id` (exact: partition pruning +
    * per-row residual); everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GenScan(rows, partitions, required, pushed)
}

private[sources] case class GenPartition(start: Long, end: Long) extends InputPartition

private[sources] class GenScan(
    rows: Long, partitions: Int, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen rows=$rows, PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"

  /** id bounds implied by the pushed filters (inclusive). */
  private def bounds: (Long, Long) = {
    var lo = 0L
    var hi = rows - 1
    pushed.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ =>
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = bounds
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    val all = (0 until partitions).map { p =>
      GenPartition(p * per, math.min(rows, (p + 1) * per) - 1)
    }.filter(g => g.start <= g.end)
    // partition pruning: skip generators whose id range can't match
    val kept = all.filter(g => g.end >= lo && g.start <= hi)
      .map(g => GenPartition(math.max(g.start, lo), math.min(g.end, hi)))
    GenSource.plannedPartitions = kept.length
    GenSource.prunedPartitions = all.length - kept.length
    kept.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new GenReaderFactory(required)
}

private[sources] class GenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = gp.start - 1
      private val fields = required.fieldNames

      override def next(): Boolean = { id += 1; id <= gp.end }

      override def get(): InternalRow = {
        val h = GenSource.mix(id)
        // only materialize the pruned columns
        val values = fields.map {
          case "id" => java.lang.Long.valueOf(id)
          case "ts" => java.lang.Long.valueOf(GenSource.EpochUs + (id % 86400L) * 1000000L)
          case "user_id" => java.lang.Long.valueOf(java.lang.Long.remainderUnsigned(h, 1000L))
          case "event_type" =>
            UTF8String.fromString(GenSource.EventTypes(((h >>> 8) % 4).toInt & 3))
          case "value" =>
            java.lang.Double.valueOf((java.lang.Long.remainderUnsigned(h >>> 16, 100000L)) / 100.0)
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = ()
    }
  }
}
