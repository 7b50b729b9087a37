package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // distributed compaction executor over a real small-file landing:
    // orders at sf0.1 scattered into 120 files, compacted, read back
    val sf01 = "/root/testdata/sf0.1"
    val orders = spark.read.parquet(s"$sf01/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val root = java.nio.file.Files.createTempDirectory("probe_compact").toString
    val src = s"$root/src"
    orders.repartition(120, col("o_orderkey")).write.parquet(src)
    val out = s"$root/out"
    val summary = time("compactFiles-120f") {
      ops.Layout.compactFiles(spark, src, out, targetBytes = 512 * 1024L)
        .collect()
    }
    val nRewrite = summary.count(_.getString(3) == "rewrite")
    val nCopy = summary.count(_.getString(3) == "copy")
    println(s"bins=${summary.length} rewrite=$nRewrite copy=$nCopy")
    val pre = orders.count()
    val post = spark.read.parquet(out).count()
    val distinctPost = spark.read.parquet(out).distinct().count()
    println(s"rows pre=$pre post=$post distinct=$distinctPost")
    assert(post == pre && distinctPost == pre, "row loss/dup through compaction")
    // fixed point: second pass over compacted output copies everything
    val again = ops.Layout.compactFiles(spark, out, s"$root/out2",
      targetBytes = 512 * 1024L).collect()
    assert(again.forall(_.getString(3) == "copy"),
      s"not a fixed point: ${again.map(_.getString(3)).toSeq}")
    println("PROBE_OK")
    spark.stop()
  }
}
