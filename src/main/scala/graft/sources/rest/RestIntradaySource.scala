package graft.sources.rest

import java.security.MessageDigest
import java.time.LocalDate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector restating the reference's REST JSON sources
  * (SURVEY §2.1 S2/S3/S4) Spark-first:
  *
  *   - S2 per-(day, resource) fetch → one InputPartition per (day,
  *     resource): the fetch unit IS the partition, so a 1000-executor
  *     cluster pulls 1000 days in parallel and the rate-limit/backoff
  *     logic (fitbit_utils.py:309-329) would live per-reader.
  *   - S3 paginated range scan → the date-range options bound the
  *     partition list, and pushed date/resource predicates PRUNE it
  *     before any fetch happens (`SupportsPushDownFilters`) — the Spark
  *     analogue of encoding `after`/`before` into the request URL
  *     (utils.py:55-66).
  *   - S4 `keys=` projection list → `SupportsPushDownRequiredColumns`:
  *     the reader materializes only requested columns, the analogue of
  *     the keys= URL parameter (utils.py:298,334).
  *
  * The fetch itself is a documented stand-in: production code would HTTP
  * GET the partition's URL and parse JSON (this environment has no
  * egress), so each partition instead generates its payload
  * deterministically from the portable md5 hash — which makes the whole
  * source replayable in the DuckDB oracle, partition pruning included.
  *
  * Row shape after the P5 flatten the reference applies
  * (fitbit_utils.py:374-388): (resource, date, time "HH:mm", value).
  * value = h60("iv|resource|date|time") % 1000.
  */
class RestIntradaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestIntradaySource.SCHEMA
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    def req(k: String): String = {
      val v = properties.get(k)
      require(v != null && v.nonEmpty,
        s"RestIntradaySource requires option '$k' " +
          "(resources=csv, start/end=yyyy-MM-dd)")
      v
    }
    new RestIntradayTable(req("resources"), req("start"), req("end"),
      Option(properties.get("missingDates")).getOrElse(""))
  }
}

object RestIntradaySource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("resource", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("time", StringType, nullable = false),
    StructField("value", LongType, nullable = false)))

  val MINUTES_PER_DAY = 1440

  /** Portable 60-bit hash — bit-identical to functions.Portable.h60 and
    * the DuckDB fragment (first 15 hex digits of md5 as a long). */
  def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def timeStr(minuteOfDay: Int): String =
    f"${minuteOfDay / 60}%02d:${minuteOfDay % 60}%02d"

  def value(resource: String, date: String, time: String): Long =
    h60(s"iv|$resource|$date|$time") % 1000
}

final class RestIntradayTable(
    resourcesCsv: String, start: String, end: String, missingCsv: String)
  extends Table with SupportsRead {
  override def name(): String =
    s"rest_intraday($resourcesCsv, $start..$end)"
  override def schema(): StructType = RestIntradaySource.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new RestIntradayScanBuilder(
      resourcesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq.sorted,
      LocalDate.parse(start), LocalDate.parse(end),
      missingCsv.split(",").map(_.trim).filter(_.nonEmpty).toSet)
}

final class RestIntradayScanBuilder(
    allResources: Seq[String], start: LocalDate, end: LocalDate,
    missingDates: Set[String])
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var resources: Seq[String] = allResources
  private var lo: LocalDate = start
  private var hi: LocalDate = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RestIntradaySource.SCHEMA

  /** Accept date-range and resource-membership predicates: partition
    * granularity equals predicate granularity, so accepted filters are
    * applied EXACTLY by pruning (day, resource) partitions — nothing to
    * re-evaluate post-scan. Everything else — including date literals
    * that don't parse as strict ISO dates (a pushdown must never turn a
    * no-match comparison into a planning crash) — stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def isIso(v: String): Boolean =
      try { LocalDate.parse(v); true } catch { case _: Exception => false }
    val (accepted, rest) = filters.partition {
      case EqualTo("date", v: String) => isIso(v)
      case GreaterThanOrEqual("date", v: String) => isIso(v)
      case LessThanOrEqual("date", v: String) => isIso(v)
      case GreaterThan("date", v: String) => isIso(v)
      case LessThan("date", v: String) => isIso(v)
      case EqualTo("resource", _: String) => true
      case In("resource", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case EqualTo("date", v: String) =>
        lo = maxDate(lo, LocalDate.parse(v)); hi = minDate(hi, LocalDate.parse(v))
      case GreaterThanOrEqual("date", v: String) =>
        lo = maxDate(lo, LocalDate.parse(v))
      case GreaterThan("date", v: String) =>
        lo = maxDate(lo, LocalDate.parse(v).plusDays(1))
      case LessThanOrEqual("date", v: String) =>
        hi = minDate(hi, LocalDate.parse(v))
      case LessThan("date", v: String) =>
        hi = minDate(hi, LocalDate.parse(v).minusDays(1))
      case EqualTo("resource", v: String) =>
        resources = resources.filter(_ == v)
      case In("resource", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        resources = resources.filter(set)
      case _ => ()
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def maxDate(a: LocalDate, b: LocalDate) = if (a.isAfter(b)) a else b
  private def minDate(a: LocalDate, b: LocalDate) = if (a.isBefore(b)) a else b

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"RestIntradayScan resources=$resources dates=[$lo..$hi] " +
        s"columns=${required.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] = {
      val days = Iterator.iterate(lo)(_.plusDays(1))
        .takeWhile(!_.isAfter(hi)).toSeq
      (for (r <- resources; d <- days)
        yield RestPartition(r, d.toString,
          missing = missingDates.contains(d.toString)): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new RestReaderFactory(required)
  }
}

final case class RestPartition(
    resource: String, date: String, missing: Boolean = false)
  extends InputPartition

final class RestReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestPartition]
    new PartitionReader[InternalRow] {
      // production: HTTP GET the per-(day,resource) URL here, honoring
      // rate-limit headers; canned deterministic payload instead. A
      // `missing` partition is the 404 path (F6, utils.py:349-351):
      // the reader yields zero rows and the job proceeds — the dropped
      // activity never surfaces downstream, no error propagation.
      private var m = -1
      override def next(): Boolean = {
        if (part.missing) return false
        m += 1; m < RestIntradaySource.MINUTES_PER_DAY
      }
      override def get(): InternalRow = {
        val t = RestIntradaySource.timeStr(m)
        val cols = required.fieldNames.map {
          case "resource" => UTF8String.fromString(part.resource)
          case "date" => UTF8String.fromString(part.date)
          case "time" => UTF8String.fromString(t)
          case "value" => java.lang.Long.valueOf(
            RestIntradaySource.value(part.resource, part.date, t))
        }
        InternalRow.fromSeq(cols.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
