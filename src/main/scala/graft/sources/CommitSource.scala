package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's paginated commit source
  * (SURVEY §2.1 O1-O3 "full fidelity" mapping of `git_etl.ts:53-74`):
  *
  *  - one `InputPartition` per 100-row PAGE (the reference's `per_page:
  *    100` chunking, `git_etl.ts:64`) — pages read in parallel instead of
  *    the reference's sequential pagination;
  *  - `SupportsPushDownFilters` accepts `ts >= bound` and applies it AT THE
  *    SOURCE, the exact analog of pushing `since` into the API request
  *    (`git_etl.ts:63`) — the scan then emits only matching rows, and the
  *    pushed filter is visible in `.explain` (`PushedFilters`);
  *  - `SupportsPushDownRequiredColumns` prunes the emitted columns.
  *
  * Rows are DETERMINISTIC synthetic commits (this environment has no
  * network): row i has ts = 2024-01-01 + i*137s, sha = "c"+zero-padded i,
  * email = "u<i%50>@x", message = "m<i%7>" — formulas simple enough for
  * the DuckDB oracle to reproduce from a `range()` table.
  *
  * Usage: `spark.read.format("graft.sources.CommitSource")
  *   .option("rows", n).load()`.
  */
class CommitSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CommitSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CommitTable(properties.asScala.getOrElse("rows", "1000").toLong)
}

object CommitSource {
  val PageSize = 100 // git_etl.ts:64
  val BaseMicros: Long = java.time.Instant.parse("2024-01-01T00:00:00Z")
    .getEpochSecond * 1000000L
  val StepMicros: Long = 137L * 1000000L

  val schema: StructType = StructType(Seq(
    StructField("sha", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("message", StringType, nullable = false)))

  def tsMicrosOf(i: Long): Long = BaseMicros + i * StepMicros
  def shaOf(i: Long): String = "c" + "%08d".format(i)
  def emailOf(i: Long): String = s"u${i % 50}@x"
  def messageOf(i: Long): String = s"m${i % 7}"
}

class CommitTable(totalRows: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_commits($totalRows)"
  override def schema(): StructType = CommitSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CommitScanBuilder(totalRows)
}

class CommitScanBuilder(totalRows: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var sinceMicros: Long = Long.MinValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CommitSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("ts", _: java.sql.Timestamp) => true
      case _ => false
    }
    accepted.foreach { case GreaterThanOrEqual(_, t: java.sql.Timestamp) =>
      // like the reference's `since`: an inclusive lower bound on ts.
      // Exact micros (floor(millis)*1e3 + sub-milli micros): getTime alone
      // truncates to milliseconds, which would under-bound a sub-milli
      // filter while claiming it fully handled — extra rows with no
      // residual filter to catch them.
      sinceMicros = math.max(sinceMicros,
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    }
    pushed = accepted
    rejected // Spark re-applies anything the source didn't take
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new CommitScan(totalRows, sinceMicros, required)
}

case class CommitPage(start: Long, end: Long) extends InputPartition

class CommitScan(totalRows: Long, sinceMicros: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_commits rows=$totalRows since=" +
      (if (sinceMicros == Long.MinValue) "none" else sinceMicros.toString)

  override def planInputPartitions(): Array[InputPartition] = {
    // source-side pushdown: rows are ts-ordered, so the `since` bound maps
    // to a starting row index and earlier PAGES are never planned at all
    val firstRow =
      if (sinceMicros == Long.MinValue) 0L
      else {
        val delta = sinceMicros - CommitSource.BaseMicros
        if (delta <= 0) 0L
        else (delta + CommitSource.StepMicros - 1) / CommitSource.StepMicros
      }
    val firstPage = firstRow / CommitSource.PageSize
    val lastPage = (totalRows + CommitSource.PageSize - 1) / CommitSource.PageSize
    (firstPage until lastPage).map { p =>
      CommitPage(p * CommitSource.PageSize,
        math.min((p + 1) * CommitSource.PageSize, totalRows)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    val since = sinceMicros
    (partition: InputPartition) => {
      val page = partition.asInstanceOf[CommitPage]
      new PartitionReader[InternalRow] {
        private var i = page.start - 1
        override def next(): Boolean = {
          i += 1
          // per-row residual of the pushed bound (page granularity above)
          while (i < page.end && CommitSource.tsMicrosOf(i) < since) i += 1
          i < page.end
        }
        override def get(): InternalRow = {
          val vals = fields.map {
            case "sha"     => UTF8String.fromString(CommitSource.shaOf(i))
            case "ts"      => java.lang.Long.valueOf(CommitSource.tsMicrosOf(i))
            case "email"   => UTF8String.fromString(CommitSource.emailOf(i))
            case "message" => UTF8String.fromString(CommitSource.messageOf(i))
          }
          new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        }
        override def close(): Unit = ()
      }
    }
  }
}
