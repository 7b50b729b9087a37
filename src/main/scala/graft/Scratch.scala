package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("drive").toString
    println(s"== workdir $root")

    // ---- ListProducer pipeline end-to-end
    val invDir = s"$root/inventory"
    TestFx.writeInventory(invDir)
    TestFx.writeManifest(root)
    val res = graft.exec.ListProducerJob.run(spark, s"$root/manifest.json",
      s"$invDir/*.csv.gz", s"$root/job.json", s"$root/queue",
      dstBucket = "dstb", queues = 2, batchSize = 3)
    println(s"== ListProducerJob: $res")
    println("== job.json:")
    println(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$root/job.json")))

    // ---- streaming executor over the SAME queue the batch job produced
    val q = graft.streaming.TaskPipeline.runExecutor(spark, s"$root/queue",
      s"$root/log", s"$root/dlq", s"$root/ckpt",
      failWhen = col("Key").contains("5mb"))
    q.processAllAvailable(); q.stop()
    println("== monitor log:")
    spark.read.parquet(s"$root/log").select("Key","ok","receive_count").show(20, false)
    println("== DLQ:")
    try spark.read.json(s"$root/dlq").select("Key","receive_count").show(false)
    catch { case _: Throwable => println("(empty)") }
    println("== queue file count after drain: " +
      new java.io.File(s"$root/queue").listFiles().count(_.getName.startsWith("part")))

    // stats over the produced log
    graft.streaming.TaskPipeline.statsIncrement(spark, s"$root/log", s"$root/stat")
    println("== stat store:")
    spark.read.parquet(s"$root/stat").orderBy("start_time").show(false)
    spark.stop()
  }
}
object TestFx {
  import java.io._; import java.util.zip.GZIPOutputStream
  def writeInventory(dir: String): Unit = {
    new File(dir).mkdirs()
    val w = new BufferedWriter(new OutputStreamWriter(new GZIPOutputStream(new FileOutputStream(s"$dir/shard.csv.gz")), "UTF-8"))
    val rows = Seq(
      ("srcb","plain/key.bin",500000L), ("srcb","space%20and+plus.bin",1000000L),
      ("srcb","at-5mb.bin",5000000L), ("srcb","just-over-5mb.bin",5000001L),
      ("srcb","big-1e8.bin",100000000L), ("srcb","huge-2e9.bin",2000000000L),
      ("srcb","oversize-6e9.bin",6000000000L))
    rows.foreach { case (b,k,s) =>
      w.write(Seq(b,k,s.toString,"2017-12-24T01:02:03.000Z","e","STANDARD","false","")
        .map(f => "\"" + f + "\"").mkString(",")); w.newLine() }
    w.write("\"malformed\",\"row\""); w.newLine()
    w.close()
  }
  def writeManifest(dir: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/manifest.json"),
      """{"sourceBucket": "srcb", "destinationBucket": "dstb", "version": "2016-11-30",
        |"fileFormat": "CSV", "fileSchema": "Bucket, Key, Size, ...",
        |"files": [{"key": "shard.csv.gz", "size": 1, "MD5checksum": "x"}]}""".stripMargin)
}
