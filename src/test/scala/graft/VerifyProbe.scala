package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.1"

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.read.parquet(s"$sf/orders.parquet").count() // warm

    // q38 regression probe: time q29 (verification) vs q38 (summary)
    (1 to 4).foreach { r =>
      time(s"q29-verification-$r") {
        Queries.all("q29_verification")(spark, sf).count()
      }
      time(s"q38-summary-$r") {
        Queries.all("q38_verdict_summary")(spark, sf).count()
      }
    }
    Queries.all("q38_verdict_summary")(spark, sf).explain("formatted")

    println("PROBE_OK")
    spark.stop()
  }
}
