package graft.connectors

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal, Murmur3Hash}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  def nBuckets(path: String): Int = {
    val p = java.nio.file.Paths.get(path, "_nbuckets")
    require(java.nio.file.Files.exists(p),
      s"graft-store: missing _nbuckets marker under $path")
    java.nio.file.Files.readString(p).trim.toInt
  }

  /** The store's key columns (written at creation); empty = unknown,
    * meaning no pruning (full scan) — never wrong answers. */
  def keyCols(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path, "_keycols")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else java.nio.file.Files.readString(p).trim.split(",").toSeq
      .filter(_.nonEmpty)
  }

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

private[connectors] final case class StoreScanBuilder(path: String,
                                                      fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  private val keys = StoreMeta.keyCols(path)

  private def prunable(f: Filter): Boolean = f match {
    // single-key stores: one equality or one IN list prunes directly;
    // composite-key stores prune only on a full EqualTo conjunction
    // (assembled in the scan), so each member is individually useful
    case EqualTo(a, _) => keys.contains(a)
    case In(a, _) => keys.size == 1 && keys.head == a
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    // everything stays residual: the source prunes BUCKETS, Spark
    // still evaluates every predicate row-wise
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = StoreScan(path, fullSchema, required, pushed)
}

private[connectors] final case class StoreScan(path: String,
                                               fullSchema: StructType,
                                               required: StructType,
                                               pushed: Array[Filter])
    extends Scan with Batch {

  private lazy val allBuckets: Seq[String] = StoreMeta.liveBuckets(path)

  /** Bucket indices the pushed key filters allow; None = all. */
  private lazy val wanted: Option[Set[Int]] = {
    val keys = StoreMeta.keyCols(path)
    if (keys.isEmpty || pushed.isEmpty) None
    else {
      val n = StoreMeta.nBuckets(path)
      def dt(c: String): DataType = fullSchema(c).dataType
      val perFilter: Seq[Set[Int]] =
        if (keys.size == 1) pushed.toSeq.collect {
          case EqualTo(a, v) if a == keys.head =>
            Set(StoreMeta.bucketOf(Seq((v, dt(a))), n))
          case In(a, vs) if a == keys.head =>
            vs.toSet[Any].map(v => StoreMeta.bucketOf(Seq((v, dt(a))), n))
        } else {
          // composite key: prune only when EVERY key column has an
          // EqualTo — the combined tuple hashes to one bucket
          val eqs = pushed.collect { case EqualTo(a, v) => a -> v }.toMap
          if (keys.forall(eqs.contains))
            Seq(Set(StoreMeta.bucketOf(keys.map(k => (eqs(k), dt(k))), n)))
          else Seq.empty
        }
      if (perFilter.isEmpty) None
      else Some(perFilter.reduce(_ intersect _)) // filters are ANDed
    }
  }

  private lazy val selected: Seq[String] = wanted match {
    case None => allBuckets
    case Some(ws) => allBuckets.filter { dir =>
      val b = new Path(dir).getName.stripPrefix("b").toInt
      ws.contains(b)
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftStore $path buckets ${selected.size}/${allBuckets.size}" +
      s" pushedKeyFilters [${pushed.mkString(", ")}]"

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
    StoreReaderFactory(required)
}

private[connectors] final case class BucketPartition(files: Seq[String])
    extends InputPartition

private[connectors] final case class StoreReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BucketReader(p.asInstanceOf[BucketPartition].files, schema)
}

/** Executor-side reader: parquet-hadoop Group API over one bucket's
  * files, converted to the required schema. Supported shapes are the
  * store family's — atomic (bool/int/long/float/double/string) and
  * arrays of atomics; anything else fails loudly. */
private[connectors] final class BucketReader(files: Seq[String],
                                             schema: StructType)
    extends PartitionReader[InternalRow] {

  private val iter = files.iterator
  private var reader: ParquetReader[Group] = _
  private var current: Group = _

  override def next(): Boolean = {
    while (true) {
      if (reader == null) {
        if (!iter.hasNext) return false
        reader = ParquetReader
          .builder(new GroupReadSupport(), new Path(iter.next()))
          .withConf(new Configuration()).build()
      }
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false // unreachable
  }

  override def get(): InternalRow =
    new GenericInternalRow(schema.fields.map(f => readField(current, f)))

  override def close(): Unit = if (reader != null) reader.close()

  private def readField(g: Group, f: StructField): Any = {
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
