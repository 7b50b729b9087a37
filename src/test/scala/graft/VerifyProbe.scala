package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")

    // DSv2 store: build a ~600k-row ledger, then probe it three ways
    val store = "/tmp/probe_dsv2_store/ledger"
    locally {
      val root = java.nio.file.Paths.get("/tmp/probe_dsv2_store")
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
    }
    time("store-build-sf0.1") {
      sinks.Sinks.upsertPartitioned(
        li.select(
          md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("msg_id"),
          col("l_orderkey").as("sent_order"),
          col("l_extendedprice").as("price")),
        Seq("msg_id"), store, nBuckets = 64)
    }
    val ds = spark.read.format("graft-store").load(store)
    val total = li.count()

    // 1. footer-only aggregate probe: zero decoded rows
    val before = connectors.StoreReaderMetrics.rowsDecoded.get()
    val agg = time("store-agg-pushdown") {
      ds.agg(count(lit(1)).as("n"), min(col("sent_order")).as("lo"),
        max(col("sent_order")).as("hi"), min(col("price")).as("pmin"),
        max(col("price")).as("pmax")).collect().head
    }
    val decoded = connectors.StoreReaderMetrics.rowsDecoded.get() - before
    assert(decoded == 0, s"agg probe decoded $decoded rows, want 0")
    assert(agg.getLong(0) == total, s"pushed count ${agg.getLong(0)} != $total")
    val exp = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_extendedprice"), max("l_extendedprice")).collect().head
    assert(agg.getLong(1) == exp.getLong(0) && agg.getLong(2) == exp.getLong(1))
    assert(agg.getDouble(3) == exp.getDouble(2) && agg.getDouble(4) == exp.getDouble(3))
    println(s"AGG n=${agg.getLong(0)} orderkey=[${agg.getLong(1)},${agg.getLong(2)}]" +
      s" price=[${agg.getDouble(3)},${agg.getDouble(4)}] decodedRows=$decoded")

    // 2. the same probe WITHOUT pushdown (plain reader) for scale contrast
    time("store-agg-fullscan") {
      sinks.Sinks.readPartitioned(spark, store)
        .agg(count(lit(1)), min(col("sent_order")), max(col("sent_order")))
        .collect()
    }

    // 3. batch-get point probe still prunes with the agg path present
    val keys = li.filter(col("l_orderkey") % 59999 === 0)
      .select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSeq
    val probe = ds.filter(col("msg_id").isin(keys: _*))
    val planned = probe.rdd.getNumPartitions
    val hit = time("store-batch-get")(probe.count())
    // the synthetic lineitem is NOT (orderkey, linenumber)-unique, and
    // the upsert store keeps in-batch duplicate keys — expect row
    // matches, not key count
    val expHit = li.filter(col("l_orderkey") % 59999 === 0).count()
    println(s"PROBE keys=${keys.size} buckets=$planned/64 rows=$hit exp=$expHit")
    assert(planned <= keys.size && hit == expHit)

    // 4. round-10: a second upsert touching EVERY bucket must still be
    // one staged job + renames; the _stats marker totals must match
    val delta = li.filter(col("l_orderkey") % 7 === 0)
      .select(
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("msg_id"),
        (col("l_orderkey") + 1000000L).as("sent_order"),
        col("l_extendedprice").as("price"))
    time("store-upsert-delta") {
      sinks.Sinks.upsertPartitioned(delta, Seq("msg_id"), store, nBuckets = 64)
    }
    val storeRows = sinks.Sinks.readPartitioned(spark, store).count()
    val statsMap = sinks.Sinks.bucketStats(store).get
    assert(statsMap.size == 64, s"_stats must cover all 64 buckets: ${statsMap.size}")
    assert(statsMap.values.map(_._1).sum == storeRows,
      s"_stats rows ${statsMap.values.map(_._1).sum} != store rows $storeRows")
    val rel = spark.read.format("graft-store").load(store)
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
    val st = rel.scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().isPresent && st.numRows().getAsLong == storeRows,
      s"estimateStatistics numRows must serve the marker: ${st.numRows()}")
    println(s"STATS rows=$storeRows bytes=${st.sizeInBytes().getAsLong}")

    println("PROBE_OK")
    spark.stop()
  }
}
