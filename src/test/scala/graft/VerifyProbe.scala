package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- round-7 additions: HLL sketch, compaction plan, bucketed join
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.count() // warm

    val est = time("hll-approx-distinct") {
      ops.Cardinality.approxDistinct(
        orders.select(col("o_orderstatus").as("status"), col("o_custkey")),
        Seq("status"), col("o_custkey")).collect()
    }
    est.foreach(println)
    val exact = orders.groupBy(col("o_orderstatus").as("status"))
      .agg(countDistinct("o_custkey").as("exact")).collect()
    exact.foreach(println)

    val plan = time("compaction-plan") {
      ops.Layout.compactionSummary(
        ops.Layout.compactionPlan(
          orders.select(col("o_orderpriority").as("part"),
            concat(lit("f"), lpad(col("o_orderkey").cast("string"), 12, "0"))
              .as("file"),
            floor(col("o_totalprice")).cast("bigint").as("bytes")),
          "part", "file", "bytes", 256000000L),
        "part", "bytes")
    }
    println("bins=" + plan.count())
    plan.orderBy("part", "bin").show(8, truncate = false)

    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val (bo, bc) = time("bucketed-write") {
      ops.Layout.bucketedPair(
        orders.select(col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("cents")),
        "o_custkey",
        cust.select(col("c_custkey"), col("c_mktsegment")), "c_custkey",
        buckets = 16, nameA = "probe_bkt_o", nameB = "probe_bkt_c")
    }
    time("bucketed-join-agg") {
      val joined = bo.join(bc, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey").agg(sum("cents"))
      println("per-cust rows=" + joined.count())
      val ex = joined.queryExecution.executedPlan.toString
      println("exchanges-in-plan=" +
        "Exchange".r.findAllIn(ex).size + " (AQE may plan reads)")
    }
    spark.sql("DROP TABLE IF EXISTS probe_bkt_o")
    spark.sql("DROP TABLE IF EXISTS probe_bkt_c")

    println("PROBE_OK")
    spark.stop()
  }
}
