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
    import graft.ops.ThetaSketch
    import graft.sinks.VersionedStore

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val root = "/tmp/verifyprobe_r11/store"
    new java.io.File("/tmp/verifyprobe_r11").mkdirs()
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path("/tmp/verifyprobe_r11"), true)

    // ---- VersionedStore: tagged epochs, fused applyOps, footer history
    val base = docs.select($"doc_id", $"source",
      length($"text").cast("long").as("len"))
    val e1 = time("vs bootstrap") {
      VersionedStore.upsert(base, Seq("doc_id"), root, nBuckets = 16,
        tag = "batch-1")
    }
    require(e1 == 1L, s"bootstrap epoch = $e1")
    require(VersionedStore.taggedEpoch(root, "batch-1").contains(1L))
    require(VersionedStore.taggedEpoch(root, "1").isEmpty,
      "suffix probe must NOT match (exactly-once fence)")
    require(VersionedStore.taggedEpoch(root, "batch").isEmpty)

    val cdc = docs.filter($"doc_id" % 100 === 0)
      .select($"doc_id", $"source", lit(-1L).as("len"),
        when($"doc_id" % 200 === 0, "delete").otherwise("upsert").as("op"))
    val e2 = time("vs applyOps") {
      VersionedStore.applyOps(cdc, Seq("doc_id"), root, "op", tag = "batch-2")
    }
    require(e2 == 2L)
    val n1 = VersionedStore.readAsOf(spark, root, 1).count()
    val n2 = VersionedStore.readAsOf(spark, root, 2).count()
    val nDel = docs.filter($"doc_id" % 200 === 0).count()
    require(n1 - n2 == nDel, s"applyOps deletes: $n1 - $n2 != $nDel")

    val hist = time("vs history (footers)") {
      VersionedStore.history(spark, root)
        .as[(Long, String, Option[Long])].collect().toSeq.sortBy(_._1)
    }
    require(hist == Seq((1L, "upsert@batch-1", Some(n1)),
      (2L, "apply@batch-2", Some(n2))), s"history rows: $hist")

    // ---- containment gate on real sketches incl. engineered n_b = 0
    val sh = docs.select($"source",
      explode(split($"text", "\\s+")).as("tok")).filter($"tok" =!= "")
    val hist512 = ThetaSketch.sketch(sh, Seq("source"), $"tok", 512)
    val batch512 = ThetaSketch.sketch(
      sh.filter($"source" === "src1"), Seq("source"), $"tok", 512)
    val gate = time("containment gate") {
      ThetaSketch.containmentGate(
        ThetaSketch.setOps(hist512, batch512, Seq("source"), 512), 600000L)
        .select($"source", $"n_b", $"containment_ppm", $"verdict")
        .as[(String, Long, Option[Long], String)].collect().toSeq
    }
    // the batch holds ONLY src1: its tokens are all old news (fully
    // contained, stable); every other source has ZERO batch evidence
    // (n_b = 0) and must fail CLOSED — the exact hazard the old
    // null-through-otherwise verdict got wrong
    require(gate.nonEmpty, "empty gate output")
    gate.foreach {
      case ("src1", nb, c, v) =>
        require(nb > 0 && c.contains(1000000L) && v == "stable",
          s"src1 should be fully contained: $gate")
      case (_, nb, c, v) =>
        require(nb == 0L && c.isEmpty && v == "shifted",
          s"n_b=0 sources must gate shifted: $gate")
    }
    val forced = ThetaSketch.containmentGate(
      Seq(("g", 4L, 0L, 4L, 0L)).toDF("g", "n_l", "matched", "n_a", "n_b"),
      600000L).select($"containment_ppm", $"verdict")
      .as[(Option[Long], String)].head()
    require(forced == ((None, "shifted")), s"n_b=0 must fail closed: $forced")

    println("VERIFYPROBE OK")
    spark.stop()
  }
}
