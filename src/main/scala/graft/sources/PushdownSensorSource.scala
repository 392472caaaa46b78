package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 source with FILTER and COLUMN pushdown — the
  * connector-side half of the scan-pruning story PlanQualitySpec pins
  * for parquet. Same deterministic sensor stream as [[SensorSource]],
  * but the scan builder:
  *
  *   - accepts `sensorID` predicates (=, <, <=, >, >=, IN) and prunes
  *     WHOLE input partitions before they are planned — the DSv2
  *     analog of partition pruning, which is what makes a 100-TB scan
  *     with a selective shard predicate read only its shards. Every
  *     accepted filter is also returned as residual (postScanFilters)
  *     so Spark re-checks rows — pruning is a performance contract,
  *     not a correctness one, exactly like parquet row-group skipping;
  *   - accepts column pruning (`SupportsPushDownRequiredColumns`), so
  *     a projection of one column materializes one value per row at
  *     the reader instead of the full row.
  *
  * Usage:
  *   spark.read.format("graft.sources.PushdownSensorProvider")
  *     .option("sensors", "8").option("readings", "100").load()
  */
object PushdownSensorSource {
  /** Observability for specs: partitions planned by the LAST scan. */
  val lastPlannedPartitions = new AtomicInteger(-1)

  private[sources] def keeps(pushed: Seq[Filter], sid: Int): Boolean =
    pushed.forall {
      case EqualTo("sensorID", v: Int)            => sid == v
      case LessThan("sensorID", v: Int)           => sid < v
      case LessThanOrEqual("sensorID", v: Int)    => sid <= v
      case GreaterThan("sensorID", v: Int)        => sid > v
      case GreaterThanOrEqual("sensorID", v: Int) => sid >= v
      case In("sensorID", vs)                     => vs.contains(sid)
      case _                                      => true
    }
}

class PushdownSensorProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SensorSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PushdownSensorTable(
      properties.getOrDefault("sensors", "4").toInt,
      properties.getOrDefault("readings", "100").toLong)
}

class PushdownSensorTable(sensors: Int, readings: Long)
    extends Table with SupportsRead {
  override def name(): String = s"pushdown-sensors($sensors x $readings)"
  override def schema(): StructType = SensorSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PushdownSensorScanBuilder(sensors, readings)
}

class PushdownSensorScanBuilder(sensors: Int, readings: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SensorSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept only sensorID shard predicates; everything else is the
    // engine's job. Return ALL filters as residual: the source prunes
    // partitions, Spark still verifies rows (parquet semantics).
    pushed = filters.filter(f =>
      f.references.sameElements(Array("sensorID")) && (f match {
        case _: EqualTo | _: LessThan | _: LessThanOrEqual |
             _: GreaterThan | _: GreaterThanOrEqual | _: In => true
        case _ => false
      }))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new PushdownSensorScan(sensors, readings, pushed.toSeq, required)
}

class PushdownSensorScan(sensors: Int, readings: Long,
    pushed: Seq[Filter], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PushedSensorFilters: [${pushed.mkString(", ")}], " +
      s"ReadColumns: [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = (0 until sensors)
      .filter(sid => PushdownSensorSource.keeps(pushed, sid))
      .map(sid => PrunedSensorPartition(sid, readings,
        required.fieldNames): InputPartition)
      .toArray
    PushdownSensorSource.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) =>
      new PrunedSensorReader(p.asInstanceOf[PrunedSensorPartition])
}

case class PrunedSensorPartition(sensorID: Int, readings: Long,
    columns: Array[String]) extends InputPartition

class PrunedSensorReader(p: PrunedSensorPartition)
    extends PartitionReader[InternalRow] {
  private var i = 0L
  private var temp = SensorSource.StartTemp + p.sensorID

  override def next(): Boolean = {
    i += 1
    temp += SensorSource.HeatStep
    i <= p.readings
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(p.columns.toSeq.map {
      case "sensorID"    => p.sensorID
      case "seq"         => i
      case "temperature" => temp
    })

  override def close(): Unit = ()
}
