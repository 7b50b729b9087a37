package graft.connectors

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{DataSkipping, Sinks, VersionedStore}

/** The MVCC [[VersionedStore]] as a DataSource V2 TABLE — the SQL
  * surface of the store family: any snapshot is addressable without
  * the Scala API,
  * {{{
  *   spark.read.format("graft-vstore").option("path", root).load()
  *   spark.read.format("graft-vstore").option("epoch", 3).load()        // time travel
  *   spark.read.format("graft-vstore").option("timestampMillis", t)...  // AS OF TIMESTAMP
  * }}}
  * with the store's whole read discipline intact at PLAN time:
  *
  *  - **key pushdown** — `EqualTo`/`In` on the key columns replay the
  *    writer's Murmur3 hash and plan only those keys' bucket chains
  *    (the [[GraftStoreSource]] posture on the versioned layout);
  *  - **data skipping** — range/equality comparisons consult the
  *    per-generation `_cstats` manifests and drop whole chains whose
  *    stats exclude the predicate (filters stay residual: pruning is
  *    conservative, Spark re-evaluates row-wise);
  *  - **merge-on-read, inside the reader** — a delta'd bucket's chain
  *    resolves newest-wins-per-key IN the executor's partition reader
  *    (the Hudi file-group-local merge): delta generations are
  *    batch-sized by the MOR contract, so the reader holds delta keys
  *    in memory, streams the base once dropping superseded keys, and
  *    emits surviving delta rows — no shuffle, no driver involvement;
  *  - **snapshot schema** — the table serves `schemaAsOf(epoch)`;
  *    generations written before an additive evolution read the new
  *    columns as null (`tolerateMissing` projection);
  *  - **statistics** — real post-pruning sizeInBytes, so a small
  *    snapshot auto-broadcasts in joins.
  *
  * Read-only by design (BATCH_READ): writes go through the store's
  * transactional API — a blind DSv2 write would bypass the commit
  * fence, the ownership tokens, and MOR semantics. */
class GraftVStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-vstore"
  override def supportsExternalMetadata(): Boolean = true

  private def epochOf(options: CaseInsensitiveStringMap, path: String): Long = {
    val byEpoch = Option(options.get("epoch")).map(_.trim.toLong)
    val byTs = Option(options.get("timestampMillis")).map(_.trim.toLong)
    require(byEpoch.isEmpty || byTs.isEmpty,
      "graft-vstore: give epoch OR timestampMillis, not both")
    byEpoch.orElse(byTs.map(t => VersionedStore.epochAt(path, t)))
      .getOrElse(VersionedStore.currentEpoch(path))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = StoreMeta.pathOf(options.get("path"))
    StructType.fromDDL(VersionedStore.schemaAsOf(path, epochOf(options, path)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = StoreMeta.pathOf(options.get("path"))
    VStoreTable(path, epochOf(options, path), schema)
  }
}

private[connectors] final case class VStoreTable(path: String, epoch: Long,
                                                 tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_vstore($path@$epoch)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    VStoreScanBuilder(path, epoch, tableSchema)
}

private[connectors] final case class VStoreScanBuilder(
    path: String, epoch: Long, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  private val keys = StoreMeta.keyCols(path)

  private def keyPrunable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => keys.contains(a)
    case In(a, _) => keys.size == 1 && keys.head == a
    case _ => false
  }
  private def statPrunable(f: Filter): Boolean =
    DataSkipping.filterColumn(f).exists(c =>
      fullSchema.fieldNames.contains(c) &&
        DataSkipping.supportedType(fullSchema(c).dataType))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => keyPrunable(f) || statPrunable(f))
    filters // everything stays residual — pruning only skips chains
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = VStoreScan(path, epoch, fullSchema, required,
    pushed)
}

private[connectors] final case class VStoreScan(path: String, epoch: Long,
                                                fullSchema: StructType,
                                                required: StructType,
                                                pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  private lazy val keys = StoreMeta.keyCols(path)

  /** The snapshot's serving chains, resolved ONCE at plan time from
    * the commit log (vacuum watermark honored like every read). */
  private lazy val chains: Seq[(Int, graft.sinks.VersionedStore.Chain)] = {
    val wm = VersionedStore.retentionWatermark(path)
    require(epoch >= wm,
      s"graft-vstore epoch $epoch is below the vacuum watermark $wm")
    val committed = VersionedStore.commits(path)
    val cur = committed.lastOption.map(_.epoch).getOrElse(0L)
    require(epoch <= cur,
      s"graft-vstore epoch $epoch is beyond current epoch $cur")
    VersionedStore.snapshotChains(path, committed, epoch).toSeq
      .filter(_._2.paths.nonEmpty).sortBy(_._1)
  }

  /** Key-hash pruning (the GraftStoreSource rule, on the versioned
    * layout): None = no pruning. */
  private def keyBuckets: Option[Set[Int]] = {
    if (keys.isEmpty || pushed.isEmpty) return None
    val n = Sinks.storeMarker(path, "_nbuckets")
      .map(_.trim.toInt).getOrElse(return None)
    def dt(c: String): DataType = fullSchema(c).dataType
    val perFilter: Seq[Set[Int]] =
      if (keys.size == 1) pushed.toSeq.collect {
        case EqualTo(a, v) if a == keys.head =>
          Set(StoreMeta.bucketOf(Seq((v, dt(a))), n))
        case In(a, vs) if a == keys.head =>
          vs.toSet[Any].map(v => StoreMeta.bucketOf(Seq((v, dt(a))), n))
      } else {
        val eqs = pushed.collect { case EqualTo(a, v) => a -> v }.toMap
        if (keys.forall(eqs.contains))
          Seq(Set(StoreMeta.bucketOf(keys.map(k => (eqs(k), dt(k))), n)))
        else Seq.empty
      }
    if (perFilter.isEmpty) None else Some(perFilter.reduce(_ intersect _))
  }

  /** `_cstats` chain pruning: a chain survives iff SOME generation's
    * stats admit EVERY stat-prunable pushed filter (absent stats
    * admit). */
  private def statsKeep(ch: graft.sinks.VersionedStore.Chain): Boolean = {
    val cand = pushed.toSeq
      .flatMap(f => DataSkipping.filterColumn(f).map(c => (c, f)))
      .filter { case (c, _) => fullSchema.fieldNames.contains(c) &&
        DataSkipping.supportedType(fullSchema(c).dataType) }
    if (cand.isEmpty) return true
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    ch.paths.exists { gen =>
      val p = new Path(gen)
      DataSkipping.read(p.getFileSystem(conf), p) match {
        case None => true
        case Some(m) => cand.forall { case (c, f) =>
          m.get(c).forall(cs =>
            DataSkipping.survives(fullSchema(c).dataType, cs, f))
        }
      }
    }
  }

  private lazy val selected: Seq[(Int, graft.sinks.VersionedStore.Chain)] = {
    val byKey = keyBuckets
    chains.filter { case (b, ch) =>
      byKey.forall(_.contains(b)) && statsKeep(ch)
    }
  }

  private def filesOf(dirs: Seq[String]): Seq[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    dirs.flatMap { d =>
      val p = new Path(d)
      p.getFileSystem(conf).listStatus(p).map(_.getPath).filter { f =>
        val nm = f.getName
        nm.endsWith(".parquet") && !nm.startsWith(".") && !nm.startsWith("_")
      }.map(_.toString).sorted
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftVStore $path@$epoch chains ${selected.size}/${chains.size}" +
      s" pushedFilters [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    selected.map { case (_, ch) =>
      if (ch.isPlain)
        BucketPartition(filesOf(ch.base.flatMap(_._2).toSeq)): InputPartition
      else {
        val keyFields = keys.map(k => fullSchema(k))
        MorChainPartition(
          baseFiles = filesOf(ch.base.flatMap(_._2).toSeq),
          deltaFilesAsc = ch.deltas.sortBy(_._1).map(d => filesOf(Seq(d._2))),
          keySchema = StructType(keyFields)): InputPartition
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    VStoreReaderFactory(required)

  private lazy val plannedBytes: Long = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    selected.flatMap(_._2.paths).map { d =>
      val p = new Path(d)
      p.getFileSystem(conf).listStatus(p)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }.sum
  }
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(plannedBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

private[connectors] final case class MorChainPartition(
    baseFiles: Seq[String], deltaFilesAsc: Seq[Seq[String]],
    keySchema: StructType) extends InputPartition

private[connectors] final case class VStoreReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case BucketPartition(files) =>
        new BucketReader(files, required, tolerateMissing = true)
      case m: MorChainPartition =>
        new MorChainReader(m, required)
    }
}

/** Executor-side MERGE-ON-READ resolution for one bucket chain — the
  * Hudi file-group-local merge as a partition reader: delta
  * generations (batch-sized by the MOR contract; [[graft.sinks
  * .VersionedStore.compactIfNeeded]] bounds chain length) load into an
  * in-memory newest-wins key map (later epochs override, tombstones
  * mark deletion), then the base generation STREAMS through once,
  * dropping superseded keys; surviving delta rows emit last. Memory is
  * O(delta rows), never O(bucket). */
private[connectors] final class MorChainReader(part: MorChainPartition,
                                               required: StructType)
    extends PartitionReader[InternalRow] {

  private val OpField = "_op"

  // inner read schema: required columns first, then any key column not
  // already required (the merge needs keys whatever the projection)
  private val extraKeys = part.keySchema.fields
    .filterNot(f => required.fieldNames.contains(f.name)).toSeq
  private val innerSchema = StructType(required.fields.toSeq ++ extraKeys)
  private val keyIdx: Seq[Int] =
    part.keySchema.fieldNames.toSeq.map(innerSchema.fieldIndex)

  private def keyOf(r: InternalRow): List[Any] =
    keyIdx.map(i =>
      if (r.isNullAt(i)) null
      else r.get(i, innerSchema.fields(i).dataType)).toList

  private def project(r: InternalRow): InternalRow =
    new GenericInternalRow(required.fields.indices.map(i =>
      if (r.isNullAt(i)) null else r.get(i, required.fields(i).dataType))
      .toArray[Any])

  // newest-wins fold over the delta generations, ascending epoch:
  // value = Some(projected row) for an upsert, None for a tombstone
  private val resolved: java.util.LinkedHashMap[List[Any],
      Option[InternalRow]] = {
    val m = new java.util.LinkedHashMap[List[Any], Option[InternalRow]]()
    val deltaSchema =
      StructType(innerSchema.fields :+ StructField(OpField, StringType))
    val opIdx = deltaSchema.length - 1
    part.deltaFilesAsc.foreach { files =>
      val rd = new BucketReader(files, deltaSchema, tolerateMissing = true)
      try {
        while (rd.next()) {
          val r = rd.get()
          val del = !r.isNullAt(opIdx) &&
            r.getUTF8String(opIdx).toString == "delete"
          m.put(keyOf(r), if (del) None else Some(project(r)))
        }
      } finally rd.close()
    }
    m
  }

  private val base = new BucketReader(part.baseFiles, innerSchema,
    tolerateMissing = true)
  private var baseDone = part.baseFiles.isEmpty
  private var deltaIter: java.util.Iterator[Option[InternalRow]] = _
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!baseDone) {
      if (base.next()) {
        val r = base.get()
        if (!resolved.containsKey(keyOf(r))) { current = project(r); return true }
      } else { baseDone = true; base.close() }
    }
    if (deltaIter == null) deltaIter = resolved.values().iterator()
    while (deltaIter.hasNext) {
      deltaIter.next() match {
        case Some(row) => current = row; return true
        case None => // tombstone: nothing to emit
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = if (!baseDone) base.close()
}
