package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, Path,
  RawLocalFileSystem}

/** A local filesystem registered under `probe://` that tallies every
  * metadata round-trip — the instrumentation the O(generations)
  * history contract is asserted with (VersionedStoreSpec): on an
  * object store each of these calls is a network request, so the spec
  * pins their COUNT, not wall time. Counters are global because Hadoop
  * caches one FileSystem instance per scheme. */
object CountingFs {
  val statusCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { statusCalls.set(0); opens.set(0) }
}

class CountingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("probe:///")

  // RawLocalFileSystem.listStatus stats every child through the
  // public getFileStatus — an implementation detail a real object
  // store doesn't share (LIST is one round trip), so child stats
  // inside a list don't count as probes
  private val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def getFileStatus(p: Path): FileStatus = {
    if (!inList.get()) CountingFs.statusCalls.incrementAndGet()
    super.getFileStatus(p)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFs.statusCalls.incrementAndGet()
    inList.set(java.lang.Boolean.TRUE)
    try super.listStatus(p)
    finally inList.set(java.lang.Boolean.FALSE)
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    CountingFs.opens.incrementAndGet()
    super.open(p, bufferSize)
  }
}
