package graft.connectors

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal, Murmur3Hash}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.AggregatePushDownUtils
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.Sinks

/** The partitioned upsert store ([[graft.sinks.Sinks.upsertPartitioned]])
  * as a DataSource V2 TABLE with key-filter pushdown — the
  * point-lookup probe SURVEY §7.3 deferred: a dedup-gate batch get
  * (`store.filter(key isin batchKeys)`, the J2 sent-message-ledger
  * probe / DynamoDB batch-get shape) plans a scan over ONLY the hash
  * buckets those keys live in, instead of the whole store.
  *
  * How the pieces line up with the store's layout:
  *  - the store hash-partitions rows into `b00000…bNNNNN` directories
  *    by `pmod(hash(keyCols…), n)`; `_nbuckets` and `_keycols` markers
  *    make it self-describing;
  *  - [[StoreScanBuilder]] implements `SupportsPushDownFilters`:
  *    `EqualTo`/`In` filters on the key columns are accepted, and the
  *    scan replays the same Murmur3 hash on the literal values at PLAN
  *    time to keep only matching bucket directories (every filter is
  *    also returned as residual, so Spark still evaluates it row-wise —
  *    pruning is conservative, never a correctness dependency);
  *  - `SupportsPushDownRequiredColumns` prunes the read schema;
  *  - `SupportsPushDownAggregates` (partial mode) answers group-by-free
  *    `count(*)/count(col)/min/max` probes from parquet FOOTERS — one
  *    pre-aggregated row per bucket, zero decoded rows (the
  *    ledger-size / watermark probe against a billion-row store costs
  *    O(footers)); chunks with unusable statistics demote the bucket
  *    to an equivalent row-scan fallback, so stats are an optimization,
  *    never a correctness dependency;
  *  - `SupportsRuntimeFiltering` receives the JOIN side's keys after
  *    it executes — the J2 anti-join probe with a DataFrame batch side
  *    (no driver-collected IN list) re-plans to only those keys'
  *    buckets before reading a byte of the ledger;
  *  - `SupportsReportStatistics` reports real post-pruning
  *    sizeInBytes, so a ledger under the broadcast threshold
  *    auto-broadcasts in joins instead of defaulting to
  *    "unknown = never broadcast";
  *  - each surviving bucket is one `InputPartition`; readers use the
  *    parquet-hadoop Group API directly on executors (atomic types +
  *    arrays of atomics — the store family's shapes; anything else
  *    fails loudly rather than decoding wrong).
  *
  * Scale shape: a batch-get probe costs O(buckets(batch keys)), not
  * O(store) — with millions of fine-grained buckets on an object store
  * this is the difference between a point lookup and a table scan. The
  * crash-heal contract matches [[Sinks.readPartitioned]]: planning
  * recovers any bucket a crash left mid-promotion before listing.
  * StoreSourceSpec pins pruned-plan shape and row-for-row equality
  * with the plain reader. */
class GraftStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-store"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreMeta.schema(StoreMeta.pathOf(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    StoreTable(StoreMeta.pathOf(properties.get("path")), schema)
}

/** Driver-side store metadata (markers + healed bucket listing). */
private[connectors] object StoreMeta {
  def pathOf(p: String): String = {
    require(p != null && p.nonEmpty, "graft-store: a path is required")
    p
  }

  /** Live bucket directories, post-heal (the readPartitioned rule:
    * recover first, so a crashed bucket's rows are never invisible). */
  def liveBuckets(path: String): Seq[String] = {
    Sinks.recoverPartitioned(path)
    Sinks.listBuckets(path)
  }

  def schema(path: String): StructType = {
    val buckets = liveBuckets(path)
    require(buckets.nonEmpty, s"graft-store: no buckets under $path")
    SparkSession.active.read.parquet(buckets.head).schema
  }

  def nBuckets(path: String): Int =
    Sinks.storeMarker(path, "_nbuckets")
      .getOrElse(sys.error(
        s"graft-store: missing _nbuckets marker under $path"))
      .trim.toInt

  /** The store's key columns (written at creation); empty = unknown,
    * meaning no pruning (full scan) — never wrong answers. Read
    * through the store's own filesystem, so scheme-qualified stores
    * keep their pruning. */
  def keyCols(path: String): Seq[String] =
    Sinks.storeMarker(path, "_keycols")
      .map(_.trim.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** Bucket index of one concrete key tuple — replays the writer's
    * `pmod(hash(keyCols…), n)` exactly (Murmur3, seed 42). */
  def bucketOf(values: Seq[(Any, DataType)], n: Int): Int = {
    val h = Murmur3Hash(values.map { case (v, t) => Literal.create(v, t) }, 42)
      .eval(null).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}

private[connectors] final case class StoreTable(path: String,
                                                tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_store($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    StoreScanBuilder(path, tableSchema)
}

/** One pushed aggregate, in the Aggregation's declared order. The
  * reader answers these from parquet FOOTER metadata (row counts +
  * column-chunk statistics) — a store-wide `count/min/max` probe (the
  * ledger-size / HWM shape) then costs O(footers), zero decoded rows. */
private[connectors] sealed trait AggOp extends Serializable
private[connectors] case object CountStarOp extends AggOp
private[connectors] final case class CountColOp(col: String, dt: DataType) extends AggOp
private[connectors] final case class MinOp(col: String, dt: DataType) extends AggOp
private[connectors] final case class MaxOp(col: String, dt: DataType) extends AggOp

private[connectors] final case class StoreScanBuilder(path: String,
                                                      fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggOps: Option[Seq[AggOp]] = None
  private var aggSchema: Option[StructType] = None
  private var limit: Option[Int] = None

  /** PARTIAL limit pushdown: each bucket reader stops decoding after
    * `n` rows (Spark's own Limit still applies globally) — a
    * `store.limit(n)` peek decodes ≤ n·buckets rows instead of the
    * whole store. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  private val keys = StoreMeta.keyCols(path)

  /** Single-name column reference of a V2 expression, if that's what
    * it is (nested fields don't occur in the store family). */
  private def refOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames.head)
    case _ => None
  }

  /** Types whose parquet column-chunk min/max are EXACT: fixed-width
    * atomics. Strings are excluded on purpose — parquet writers may
    * truncate binary statistics, which would turn a pushed min/max
    * into a wrong answer rather than a slow one. */
  private def statType(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

  /** Group-by-free Count(*)/Count(col)/Min/Max push down (PARTIAL mode:
    * one pre-aggregated row per bucket; Spark's final aggregate merges).
    * Anything else — or any pushed key filter, which this source keeps
    * residual — declines, and Spark plans its ordinary aggregate. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    val ops = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => CountStarOp
      case c: Count if !c.isDistinct =>
        refOf(c.column).filter(fullSchema.fieldNames.contains(_))
          .map(n => CountColOp(n, fullSchema(n).dataType))
          .getOrElse(return false)
      case m: Min =>
        refOf(m.column).filter(fullSchema.fieldNames.contains(_))
          .map(n => MinOp(n, fullSchema(n).dataType))
          .filter(op => statType(op.dt)).getOrElse(return false)
      case m: Max =>
        refOf(m.column).filter(fullSchema.fieldNames.contains(_))
          .map(n => MaxOp(n, fullSchema(n).dataType))
          .filter(op => statType(op.dt)).getOrElse(return false)
      case _ => return false
    }
    // the same util parquet/orc use derives the partial-row schema, so
    // the scan's readSchema is exactly what V2ScanRelationPushDown wires
    AggregatePushDownUtils.getSchemaForPushedAggregation(
      agg, fullSchema, Set.empty, Nil) match {
      case Some(sch) => aggOps = Some(ops); aggSchema = Some(sch); true
      case None => false
    }
  }

  private def prunable(f: Filter): Boolean = f match {
    // single-key stores: one equality or one IN list prunes directly;
    // composite-key stores prune only on a full EqualTo conjunction
    // (assembled in the scan), so each member is individually useful
    case EqualTo(a, _) => keys.contains(a)
    case In(a, _) => keys.size == 1 && keys.head == a
    case _ => false
  }

  /** Range/equality filters the per-bucket `_cstats` manifests can
    * evaluate (round-13 data skipping): any comparison on a
    * stats-supported column prunes buckets whose min/max exclude it —
    * the freshness-scan pattern (`last_epoch >= N`) drops untouched
    * buckets at plan time. */
  private def statPrunable(f: Filter): Boolean =
    graft.sinks.DataSkipping.filterColumn(f).exists(c =>
      fullSchema.fieldNames.contains(c) &&
        graft.sinks.DataSkipping.supportedType(fullSchema(c).dataType))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => prunable(f) || statPrunable(f))
    // everything stays residual: the source prunes BUCKETS, Spark
    // still evaluates every predicate row-wise
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    StoreScan(path, fullSchema, aggSchema.getOrElse(required), pushed, aggOps,
      limit)
}

private[connectors] final case class StoreScan(path: String,
                                               fullSchema: StructType,
                                               required: StructType,
                                               pushed: Array[Filter],
                                               aggOps: Option[Seq[AggOp]] = None,
                                               limit: Option[Int] = None)
    extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  private lazy val allBuckets: Seq[String] = StoreMeta.liveBuckets(path)

  private lazy val keys = StoreMeta.keyCols(path)

  /** Runtime key filters ([[filter]]): delivered AFTER planning, when
    * the other side of a join has executed — the dynamic-pruning
    * sibling of the plan-time literal probe. */
  private var runtime: Array[Filter] = Array.empty

  private lazy val nBuckets: Int = StoreMeta.nBuckets(path)

  /** Bucket indices a filter set allows; None = no pruning. Shared by
    * the plan-time (`pushed`) and runtime paths — both replay the
    * writer's key hash on the literal values. */
  private def bucketsFor(filters: Array[Filter]): Option[Set[Int]] = {
    if (keys.isEmpty || filters.isEmpty) None
    else {
      val n = nBuckets
      def dt(c: String): DataType = fullSchema(c).dataType
      val perFilter: Seq[Set[Int]] =
        if (keys.size == 1) filters.toSeq.collect {
          case EqualTo(a, v) if a == keys.head =>
            Set(StoreMeta.bucketOf(Seq((v, dt(a))), n))
          case In(a, vs) if a == keys.head =>
            vs.toSet[Any].map(v => StoreMeta.bucketOf(Seq((v, dt(a))), n))
        } else {
          // composite key: prune only when EVERY key column has an
          // EqualTo — the combined tuple hashes to one bucket
          val eqs = filters.collect { case EqualTo(a, v) => a -> v }.toMap
          if (keys.forall(eqs.contains))
            Seq(Set(StoreMeta.bucketOf(keys.map(k => (eqs(k), dt(k))), n)))
          else Seq.empty
        }
      if (perFilter.isEmpty) None
      else Some(perFilter.reduce(_ intersect _)) // filters are ANDed
    }
  }

  /** Column-statistics pruning (round-13): buckets whose `_cstats`
    * manifest proves every pushed comparison empty drop at plan time —
    * one marker read per live bucket, no footer, no data page. A
    * bucket without the manifest (legacy store) or without stats for
    * the filtered column always survives. */
  private def statsFor(filters: Array[Filter]): Option[Set[Int]] = {
    import graft.sinks.DataSkipping
    val cand = filters.toSeq
      .flatMap(f => DataSkipping.filterColumn(f).map(c => (c, f)))
      .filter { case (c, _) => fullSchema.fieldNames.contains(c) &&
        DataSkipping.supportedType(fullSchema(c).dataType) }
    if (cand.isEmpty) None
    else {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      Some(allBuckets.flatMap { dirS =>
        val p = new Path(dirS)
        val keep = DataSkipping.read(p.getFileSystem(conf), p) match {
          case None => true
          case Some(m) => cand.forall { case (c, f) =>
            m.get(c).forall(cs =>
              DataSkipping.survives(fullSchema(c).dataType, cs, f))
          }
        }
        if (keep) Some(p.getName.stripPrefix("b").toInt) else None
      }.toSet)
    }
  }

  /** Plan-time pruning is computed ONCE (re-hashing a large IN key
    * list per description()/stats call would be O(keys) each time);
    * only the runtime half can change after planning. */
  private lazy val plannedWanted: Option[Set[Int]] =
    (bucketsFor(pushed), statsFor(pushed)) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    }

  /** Plan-time ∩ runtime pruning (both conservative). */
  private def wanted: Option[Set[Int]] =
    (plannedWanted, bucketsFor(runtime)) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    }

  private def restrict(ws: Option[Set[Int]]): Seq[String] = ws match {
    case None => allBuckets
    case Some(set) => allBuckets.filter { dir =>
      val b = new Path(dir).getName.stripPrefix("b").toInt
      set.contains(b)
    }
  }

  private lazy val plannedSelected: Seq[String] = restrict(plannedWanted)

  private def selected: Seq[String] =
    if (runtime.isEmpty) plannedSelected else restrict(wanted)

  // ---- SupportsRuntimeFiltering: the J2 anti-join probe without a
  // driver-collected IN list — Spark executes the (small) batch side,
  // hands its join keys here as runtime filters, and the scan re-plans
  // to only their buckets before reading a byte of the ledger
  override def filterAttributes(): Array[NamedReference] =
    keys.map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  override def filter(filters: Array[Filter]): Unit =
    runtime = filters

  // ---- SupportsReportStatistics: real sizeInBytes (post plan-time
  // pruning), so a ledger under the broadcast threshold auto-broadcasts
  // in joins instead of defaulting to "unknown = never broadcast".
  // Served from the store's `_stats` marker (maintained by every
  // upsert: one line per bucket, rows + bytes) — ZERO directory
  // listings and zero footer reads when the marker covers every
  // selected bucket; a store predating the marker, or a bucket line a
  // crash left missing, falls back to listing that bucket. Computed
  // once per scan: Spark asks for stats on every logical-plan stats
  // pass
  private lazy val plannedStats: (Long, Option[Long]) = {
    val marker = Sinks.bucketStats(path).getOrElse(Map.empty)
    val perBucket = plannedSelected.map { dir =>
      val b = new Path(dir).getName.stripPrefix("b").toInt
      marker.get(b) match {
        case Some((rows, bytes)) => (bytes, Some(rows))
        case None =>
          val fs = new Path(dir)
            .getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
          val bytes = fs.listStatus(new Path(dir))
            .filter(st => st.getPath.getName.endsWith(".parquet"))
            .map(_.getLen).sum
          (bytes, None: Option[Long])
      }
    }
    val bytes = perBucket.map(_._1).sum
    val rows =
      if (perBucket.nonEmpty && perBucket.forall(_._2.isDefined))
        Some(perBucket.flatMap(_._2).sum)
      else None
    (bytes, rows)
  }
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(plannedStats._1)
    override def numRows(): java.util.OptionalLong =
      plannedStats._2.map(java.util.OptionalLong.of)
        .getOrElse(java.util.OptionalLong.empty())
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftStore $path buckets ${selected.size}/${allBuckets.size}" +
      s" pushedKeyFilters [${pushed.mkString(", ")}]" +
      aggOps.map(ops => s" pushedAggregates [${ops.mkString(", ")}]")
        .getOrElse("") +
      limit.map(n => s" pushedLimit $n").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    // file listing happens at plan time (driver, metadata): each
    // bucket holds one live parquet file by the store's contract
    selected.map { dir =>
      val fs = new Path(dir)
        .getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new Path(dir)).map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
        }
        .map(_.toString).sorted.toSeq
      BucketPartition(files): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    StoreReaderFactory(required, aggOps, limit)
}

private[connectors] final case class BucketPartition(files: Seq[String])
    extends InputPartition

private[connectors] final case class StoreReaderFactory(
    schema: StructType, aggOps: Option[Seq[AggOp]] = None,
    limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[BucketPartition].files
    aggOps match {
      case Some(ops) => new BucketAggReader(files, schema, ops)
      case None => new BucketReader(files, schema, limit)
    }
  }
}

/** Observability seam for specs: decoded-row count across all store
  * readers in this JVM (meaningful under local[*] tests only — on a
  * real cluster each executor has its own). The agg-pushdown spec pins
  * "footers only" by asserting this does not move. */
private[graft] object StoreReaderMetrics {
  val rowsDecoded = new java.util.concurrent.atomic.AtomicLong
}

/** Executor-side PARTIAL aggregate over one bucket, answered from
  * parquet footers: Σ block row-counts for counts, folded column-chunk
  * statistics for min/max, `rows − numNulls` for count(col). Emits ONE
  * row in the pushed-aggregation schema; Spark's final aggregate merges
  * the per-bucket partials (sum of counts, min of mins, max of maxes).
  *
  * Statistics are trusted only where exact: the builder restricted
  * min/max to fixed-width atomics, and any chunk with absent/empty
  * stats (e.g. a float column containing NaN, whose stats parquet
  * drops) demotes the WHOLE bucket to a row-scan fallback computing
  * the same partials — slower, never wrong. */
private[connectors] final class BucketAggReader(files: Seq[String],
                                                schema: StructType,
                                                ops: Seq[AggOp])
    extends PartitionReader[InternalRow] {

  private var done = false
  private var row: InternalRow = _

  // Spark's NULLS-last total order for min/max folding: NaN sorts
  // greatest, matching the row-scan semantics the fallback replays
  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case IntegerType =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType =>
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case other => sys.error(s"graft-store: no stats ordering for $other")
  }

  private val needCount = ops.collect { case CountColOp(c, t) => c -> t }.distinct
  private val needMin = ops.collect { case MinOp(c, t) => c -> t }.distinct
  private val needMax = ops.collect { case MaxOp(c, t) => c -> t }.distinct

  private def fromFooters(): Option[Array[Any]] = {
    var rows = 0L
    val nonNull = scala.collection.mutable.Map.empty[String, Long]
    val mins = scala.collection.mutable.Map.empty[String, Any]
    val maxs = scala.collection.mutable.Map.empty[String, Any]
    var usable = true

    def fold(c: String, dt: DataType,
             into: scala.collection.mutable.Map[String, Any],
             s: org.apache.parquet.column.statistics.Statistics[_],
             keep: Int => Boolean): Unit =
      if (s.hasNonNullValue) {
        for (v <- Seq(s.genericGetMin, s.genericGetMax)) into.get(c) match {
          case Some(cur) if !keep(cmp(dt, v, cur)) => ()
          case _ => into(c) = v
        }
      }

    for (f <- files if usable) {
      val in = HadoopInputFile.fromPath(new Path(f), new Configuration())
      val r = ParquetFileReader.open(in)
      try {
        val it = r.getFooter.getBlocks.iterator()
        while (usable && it.hasNext) {
          val b = it.next()
          rows += b.getRowCount
          val byName = {
            val m = scala.collection.mutable.Map.empty[
              String, org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
            b.getColumns.forEach(c => m(c.getPath.toDotString) = c)
            m
          }
          // absent path = not a flat atomic chunk (e.g. count over an
          // array column whose stats live under a nested path) → the
          // row-scan fallback answers it; true schema drift still fails
          // loudly there via the Group reader
          def statsOf(c: String) =
            byName.get(c).flatMap(chunk => Option(chunk.getStatistics))
          for ((c, _) <- needCount if usable) statsOf(c) match {
            case Some(s) if s.isNumNullsSet =>
              nonNull(c) = nonNull.getOrElse(c, 0L) +
                (b.getRowCount - s.getNumNulls)
            case _ => usable = false
          }
          // a chunk's min/max is usable iff it HAS extrema, or is
          // provably all-null (nothing to fold). A chunk with non-null
          // rows but no extrema — parquet drops float/double min/max
          // when NaN is present — must demote to the row scan, or the
          // pushed max would silently lose the NaN Spark's ordering
          // treats as greatest
          def extremaUsable(s: org.apache.parquet.column.statistics.Statistics[_],
                            rowCount: Long): Boolean =
            s.hasNonNullValue || (s.isNumNullsSet && s.getNumNulls == rowCount)
          for ((c, dt) <- needMin if usable) statsOf(c) match {
            case Some(s) if extremaUsable(s, b.getRowCount) =>
              fold(c, dt, mins, s, _ < 0)
            case _ => usable = false
          }
          for ((c, dt) <- needMax if usable) statsOf(c) match {
            case Some(s) if extremaUsable(s, b.getRowCount) =>
              fold(c, dt, maxs, s, _ > 0)
            case _ => usable = false
          }
        }
      } finally r.close()
    }
    if (!usable) None
    else Some(assemble(rows, nonNull, mins, maxs))
  }

  /** Row-scan fallback: same partials from decoded values (counted in
    * [[StoreReaderMetrics]] like any other scan). */
  private def fromRows(): Array[Any] = {
    val cols = (needCount ++ needMin ++ needMax).distinct
    val scanSchema = StructType(cols.map { case (c, t) => StructField(c, t) })
    val minCols = needMin.map(_._1).toSet
    val maxCols = needMax.map(_._1).toSet
    val cntCols = needCount.map(_._1).toSet
    var rows = 0L
    val nonNull = scala.collection.mutable.Map.empty[String, Long]
    val mins = scala.collection.mutable.Map.empty[String, Any]
    val maxs = scala.collection.mutable.Map.empty[String, Any]
    val rd = new BucketReader(files, scanSchema)
    try {
      while (rd.next()) {
        val r = rd.get()
        rows += 1
        cols.zipWithIndex.foreach { case ((c, dt), i) =>
          if (!r.isNullAt(i)) {
            val v = r.get(i, dt)
            if (cntCols(c)) nonNull(c) = nonNull.getOrElse(c, 0L) + 1
            if (minCols(c) && mins.get(c).forall(cur => cmp(dt, v, cur) < 0))
              mins(c) = v
            if (maxCols(c) && maxs.get(c).forall(cur => cmp(dt, v, cur) > 0))
              maxs(c) = v
          }
        }
      }
    } finally rd.close()
    assemble(rows, nonNull, mins, maxs)
  }

  private def assemble(rows: Long,
                       nonNull: scala.collection.Map[String, Long],
                       mins: scala.collection.Map[String, Any],
                       maxs: scala.collection.Map[String, Any]): Array[Any] =
    ops.map {
      case CountStarOp => java.lang.Long.valueOf(rows)
      case CountColOp(c, _) => java.lang.Long.valueOf(nonNull.getOrElse(c, 0L))
      case MinOp(c, _) => mins.getOrElse(c, null)
      case MaxOp(c, _) => maxs.getOrElse(c, null)
    }.toArray[Any]

  override def next(): Boolean = {
    if (done) return false
    val vals = fromFooters().getOrElse(fromRows())
    row = new GenericInternalRow(vals)
    done = true
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Executor-side reader: parquet-hadoop Group API over one bucket's
  * files, converted to the required schema. Supported shapes are the
  * store family's — atomic (bool/int/long/float/double/string) and
  * arrays of atomics; anything else fails loudly. */
/** [[GroupReadSupport]] with COLUMN PRUNING pushed into the decoder:
  * the requested projection keeps only the pruned schema's fields, cut
  * from the FILE's own MessageType (same types and repetition by
  * construction — a converted Spark schema would flip `required` to
  * `optional` and fail the record reader). A `select(key)` over a wide
  * store then skips the other columns' pages entirely instead of
  * decoding full rows and projecting after. Empty projection = keep
  * everything (defensive; the scan never asks for zero columns and
  * row-count-only reads go through the footer aggregate path). */
private[connectors] final class ProjectingGroupReadSupport(
    names: Seq[String], tolerateMissing: Boolean = false)
    extends GroupReadSupport {
  override def init(context: org.apache.parquet.hadoop.api.InitContext)
      : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
    val fileSchema = context.getFileSchema
    if (names.isEmpty)
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(fileSchema)
    else {
      // tolerateMissing: the VERSIONED store's schema can evolve
      // additively, so a generation written before a column existed
      // legitimately lacks it — those rows read the column as null
      // (exactly the readChains behavior). The mutable ledger store
      // keeps the loud contract: its buckets share one schema.
      val kept = names.flatMap { n =>
        if (!fileSchema.containsField(n)) {
          require(tolerateMissing,
            s"graft-store: column '$n' missing from a bucket file — " +
              "bucket files must share the store schema")
          None
        } else Some(fileSchema.getFields.get(fileSchema.getFieldIndex(n)))
      }
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
        new org.apache.parquet.schema.MessageType(fileSchema.getName, kept: _*))
    }
  }
}

private[connectors] final class BucketReader(files: Seq[String],
                                             schema: StructType,
                                             limit: Option[Int] = None,
                                             tolerateMissing: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val iter = files.iterator
  private var reader: ParquetReader[Group] = _
  private var current: Group = _
  private var emitted = 0L

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    while (true) {
      if (reader == null) {
        if (!iter.hasNext) return false
        reader = ParquetReader
          .builder(new ProjectingGroupReadSupport(schema.fieldNames.toSeq,
            tolerateMissing), new Path(iter.next()))
          .withConf(new Configuration()).build()
      }
      current = reader.read()
      if (current != null) {
        emitted += 1
        StoreReaderMetrics.rowsDecoded.incrementAndGet()
        return true
      }
      reader.close(); reader = null
    }
    false // unreachable
  }

  override def get(): InternalRow =
    new GenericInternalRow(schema.fields.map(f => readField(current, f)))

  override def close(): Unit = if (reader != null) reader.close()

  private def readField(g: Group, f: StructField): Any = {
    if (tolerateMissing && !g.getType.containsField(f.name)) return null
    val idx = g.getType.getFieldIndex(f.name)
    if (g.getFieldRepetitionCount(idx) == 0) null
    else f.dataType match {
      case ArrayType(et, _) =>
        val lg = g.getGroup(idx, 0) // LIST wrapper
        val m = lg.getFieldRepetitionCount(0)
        new GenericArrayData((0 until m).map { i =>
          val el = lg.getGroup(0, i) // repeated "list" element group
          if (el.getFieldRepetitionCount(0) == 0) null
          else atomic(el, 0, et, f.name)
        }.toArray)
      case t => atomic(g, idx, t, f.name)
    }
  }

  private def atomic(g: Group, idx: Int, t: DataType, name: String): Any =
    t match {
      case BooleanType => g.getBoolean(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case LongType => g.getLong(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case DoubleType => g.getDouble(idx, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case other => sys.error(
        s"graft-store: unsupported type $other for column '$name' — " +
          "the DSv2 store reader covers the ledger family's shapes " +
          "(atomics + arrays of atomics)")
    }
}
