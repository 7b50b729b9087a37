package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val root = java.nio.file.Files.createTempDirectory("azd").toString
    val csv =
      """Storage-Account,Name,Creation-Time,Last-Modified,Etag,Content-Length,Variance
        |sa1,blob/new.bin,2021-01-01T00:00:00Z,2021-01-02T00:00:00Z,0xA,100,New
        |sa1,blob/del.bin,2021-01-01T00:00:00Z,2021-01-04T00:00:00Z,0xC,300,dElEtE
        |sa1,blob/bad.bin,2021-01-01T00:00:00Z,2021-01-05T00:00:00Z,0xD,garbage,New""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/diff.csv"), csv)
    val r1 = graft.exec.AzureDiffJob.run(spark, s"$root/diff.csv", s"$root/ledger", s"$root/queue")
    println(s"run1: $r1")
    spark.read.json(s"$root/queue").select("queue","batch_id","n_objects").show(false)
    println("sample body: " + spark.read.json(s"$root/queue").select("body").head().getString(0).take(300))
    val r2 = graft.exec.AzureDiffJob.run(spark, s"$root/diff.csv", s"$root/ledger", s"$root/queue")
    println(s"run2 (idempotence): $r2")
    // probe: partial overlap — a NEW diff with one repeated and one novel row
    val csv2 = csv.linesIterator.toSeq.patch(2, Seq("sa1,blob/extra.bin,2021-01-01T00:00:00Z,2021-01-06T00:00:00Z,0xE,50,New"), 1).mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/diff2.csv"), csv2)
    val r3 = graft.exec.AzureDiffJob.run(spark, s"$root/diff2.csv", s"$root/ledger", s"$root/queue")
    println(s"run3 (partial overlap, expect enqueued=1): $r3")
    spark.stop()
  }
}
