package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val mk = (rows: Seq[(String, String, String, Long)]) =>
      rows.toDF("Name", "Etag", "Last-Modified", "Content-Length")
        .withColumn("Creation-Time", lit("2021-01-01T00:00:00Z"))
    val old = mk(Seq(("a", "e1", "2021-01-02T00:00:00Z", 10L), ("b", "e2", "2021-01-02T00:00:00Z", 20L)))
    val curr = mk(Seq(("a", "e1", "2021-01-02T00:00:00Z", 10L), ("b", "e2x", "2021-01-03T00:00:00Z", 21L), ("c", "e3", "2021-01-04T00:00:00Z", 30L)))
    val diff = graft.exec.AzureDiffJob.diffSnapshots(old, curr, "sa")
    println("== wire diff:")
    diff.show(false)
    val root = java.nio.file.Files.createTempDirectory("chain").toString
    // round-trip through the ACTUAL wire format (CSV), then consume
    diff.coalesce(1).write.option("header", "true").csv(s"$root/diffcsv")
    val r = graft.exec.AzureDiffJob.run(spark, s"$root/diffcsv/*.csv", s"$root/ledger", s"$root/queue")
    println(s"consumed from wire CSV: $r")
    // probe: identical snapshots -> empty diff -> nothing enqueued
    val r0 = graft.exec.AzureDiffJob.runWithDiff(spark,
      graft.exec.AzureDiffJob.diffSnapshots(old, old, "sa"),
      s"$root/ledger2", s"$root/queue2")
    println(s"identical snapshots: $r0")
    spark.stop()
  }
}
