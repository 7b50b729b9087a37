package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("variants").toString

    // gzip -> parquet normalization over the fixture shards, then a
    // pruned+PREDICATE-pushed read off the normalized store
    TestFixturesDrive.writeGz(s"$root/csv")
    val norm = graft.sources.InventoryReader.normalizeToParquet(
      spark, s"$root/csv/*.csv.gz", s"$root/pq")
    println("normalized rows = " + norm.count())
    val q = norm.filter($"Size" > 1000000L).select("Key", "Size")
    q.show(false)
    val plan = q.queryExecution.executedPlan.toString
    println("pushed filter: " + plan.contains("PushedFilters: [IsNotNull(Size), GreaterThan(Size,1000000)]"))

    // JSON inventory variant + histogram aggregator over its sizes
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/inv.json"),
      """{"Bucket":"b","Key":"k1","Size":500000,"LastModifiedDate":"2017-12-24T01:02:03.000Z","ETag":"e","StorageClass":"STANDARD","IsMultipartUploaded":"false","ReplicationStatus":""}
        |{"Bucket":"b","Key":"k2","Size":6000000000,"LastModifiedDate":"2017-12-24T01:02:03.000Z","ETag":"e","StorageClass":"STANDARD","IsMultipartUploaded":"true","ReplicationStatus":""}
        |garbage line""".stripMargin)
    val rawJ = graft.sources.InventoryReader.readS3InventoryJson(spark, s"$root/inv.json")
    val goodJ = graft.sources.InventoryReader.goodRows(rawJ)
    println(s"json good=${goodJ.count()} corrupt=${graft.sources.InventoryReader.corruptRows(rawJ).count()}")
    val hist = goodJ.select($"Size".as[Long])
      .select(graft.ops.SizeHistogram.aggregator().toColumn).head()
    println(s"aggregator: total=${hist.total_objects} size=${hist.total_size} buckets=${hist.buckets}")

    // A8 result files via the partitioned CSV sink
    val src = Seq(("k1", 1L, 1L, "e"), ("k2", 2L, 2L, "e")).toDF("key","size","mtime","etag")
    val dst = Seq(("k1", 1L, 1L, "e")).toDF("key","size","mtime","etag")
    graft.sinks.Sinks.writePartitionedCsv(
      graft.ops.Verification.resultRows(graft.ops.Verification(src, dst, "key"),
        lit("2021-01-01 00:00:00"), lit(7L)),
      s"$root/results", "result")
    println("result dirs: " + new java.io.File(s"$root/results").listFiles()
      .map(_.getName).filter(_.startsWith("result=")).sorted.mkString(", "))
    spark.stop()
  }
}
object TestFixturesDrive {
  import java.io._; import java.util.zip.GZIPOutputStream
  def writeGz(dir: String): Unit = {
    new File(dir).mkdirs()
    val w = new BufferedWriter(new OutputStreamWriter(new GZIPOutputStream(new FileOutputStream(s"$dir/s.csv.gz")), "UTF-8"))
    Seq(("srcb","k-small",500000L), ("srcb","k-big",2000000000L), ("other","k-x",99L)).foreach { case (b,k,s) =>
      w.write(Seq(b,k,s.toString,"2017-12-24T01:02:03.000Z","e","STANDARD","false","").map(f => "\"" + f + "\"").mkString(",")); w.newLine() }
    w.close()
  }
}
