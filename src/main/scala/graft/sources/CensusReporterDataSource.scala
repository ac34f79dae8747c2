package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 wrapper so the census source participates in the normal
  * reader surface (SURVEY S3/S6 "optional polish, DSv2 wrapper"):
  *
  *   spark.read.format("censusreporter")
  *     .option("url", "censusreporter:B17001/140/05000US06073")   // live
  *     .option("file", "/path/to/cached.json")                    // offline
  *     .option("table", "B17001")
  *     .load()
  *
  * The payload is decoded once on the driver (tables are small — 628×120
  * for B17001/140); rows ship to executors inside the serialized
  * partition. Column metadata (census code/title/index/position) rides on
  * the schema's StructField.metadata exactly as with the driver-side
  * loader, so `df.census` works on the result.
  */
class CensusReporterDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "censusreporter"

  private def decode(options: CaseInsensitiveStringMap): CRTable = {
    val tableId = Option(options.get("table"))
      .orElse(Option(options.get("url")).map(u => CensusReporterUrl(u).tableId))
      .getOrElse(throw new IllegalArgumentException(
        "censusreporter source needs option 'table' (or a 3-part 'url')"))
    val json =
      if (options.containsKey("file")) {
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(options.get("file"))),
          java.nio.charset.StandardCharsets.UTF_8)
      } else if (options.containsKey("resource")) {
        val in = getClass.getClassLoader.getResourceAsStream(options.get("resource"))
        require(in != null, s"resource not found: ${options.get("resource")}")
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      } else {
        val url = Option(options.get("url")).getOrElse(throw new IllegalArgumentException(
          "censusreporter source needs one of: 'url', 'file', 'resource'"))
        CensusReporter.getResource(CensusReporterUrl(url),
          cache = !"false".equalsIgnoreCase(options.get("cache")))
      }
    CensusReporterDecoder.decode(json, tableId)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.schema.CensusMeta.schema(decode(options).columns)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = decode(new CaseInsensitiveStringMap(properties))
    new CensusReporterTable(t, graft.schema.CensusMeta.schema(t.columns))
  }

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class CensusReporterTable(t: CRTable, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "censusreporter"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // one partition is right-sized: a census table is ≤ a few thousand
        // rows; real scale comes from loading many tables in parallel
        val cells: Array[Array[Any]] = t.rows.map(_.toArray).toArray
        Array(CensusRowsPartition(cells))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new CensusReaderFactory(tableSchema)
    }
}

private[sources] final case class CensusRowsPartition(rows: Array[Array[Any]])
    extends InputPartition

private[sources] class CensusReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[CensusRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        val values = new Array[Any](r.length)
        var j = 0
        while (j < r.length) {
          values(j) = (schema.fields(j).dataType, r(j)) match {
            case (_, null) => null
            case (StringType, v) => UTF8String.fromString(v.toString)
            case (DoubleType, v: java.lang.Number) => v.doubleValue()
            case (_, v) => v
          }
          j += 1
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
