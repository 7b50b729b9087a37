package graft

import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream,
  FileStatus, LocalFileSystem, Path}

/** The bench session's default (`file://`) filesystem with METADATA-OP
  * counting — BenchGuard's round-14 driver-metadata channel: footer
  * reads, commit fences, marker probes and promote renames produce no
  * Spark job and no shuffle bytes, so round 13's regression class was
  * invisible to the jobs/shuffle instrument. Installed via
  * `spark.hadoop.fs.file.impl`; every Hadoop-API call the engine (or
  * parquet) makes against local paths increments one global counter,
  * and the per-query DELTA lands in bench_summary.json next to
  * jobs/shuffle_mb.
  *
  * Known blind spot, documented in the bench notes: the round-14 local
  * marker fast path writes through java.nio (deliberately bypassing
  * Hadoop's fork-per-create), so those specific writes don't count
  * here — on a remote-shaped store they go through the Hadoop API and
  * would. The counter still captures exists/list/open/rename/delete
  * traffic, which is what prices metadata on an object store. */
object BenchFs {
  val ops = new java.util.concurrent.atomic.AtomicLong(0L)
}

class BenchFs extends LocalFileSystem {
  private def tick(): Unit = { BenchFs.ops.incrementAndGet(); () }

  // listStatus stats children through getFileStatus internally on the
  // local FS — an implementation detail object stores don't share; a
  // ThreadLocal guard keeps a LIST one op, like a real LIST call
  private val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def getFileStatus(p: Path): FileStatus = {
    if (!inList.get()) tick()
    super.getFileStatus(p)
  }
  override def listStatus(p: Path): Array[FileStatus] = {
    tick()
    inList.set(java.lang.Boolean.TRUE)
    try super.listStatus(p)
    finally inList.set(java.lang.Boolean.FALSE)
  }
  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    tick(); super.open(p, bufferSize)
  }
  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : FSDataOutputStream = {
    tick()
    super.create(p, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    tick(); super.rename(src, dst)
  }
  override def delete(p: Path, recursive: Boolean): Boolean = {
    tick(); super.delete(p, recursive)
  }
  override def mkdirs(p: Path): Boolean = { tick(); super.mkdirs(p) }
}
