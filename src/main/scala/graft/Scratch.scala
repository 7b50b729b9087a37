package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    // 1. native expression reachable from plain SQL via the registered fn
    spark.sql("""
      SELECT multipart_etag_finish(array(md5(binary('p1')), md5(binary('p2'))), true)  AS two_part,
             multipart_etag_finish(array(md5(binary('p1'))), false)                   AS single_put,
             multipart_etag_finish(array(md5(binary('p1'))), true)                    AS one_part_mp,
             multipart_etag_finish(array()::array<string>, false)                     AS empty_in
    """).show(false)
    // codegen inspection: the expression must appear inside the generated code
    val df = spark.sql("SELECT multipart_etag_finish(array(md5(binary(repeat('x', id)))), true) AS e FROM range(3)")
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("codegen mentions kernel: " + gen.contains("MultipartEtagFinish"))
    df.show(false)

    // 2. probe: wrong arity + wrong types give analysis errors, not crashes
    for (bad <- Seq(
      "SELECT multipart_etag_finish(array(md5(binary('p'))))",
      "SELECT multipart_etag_finish(7, true)")) {
      try { spark.sql(bad).collect(); println("NO ERROR (unexpected): " + bad) }
      catch { case e: Exception => println("rejected ok: " + e.getMessage.linesIterator.next()) }
    }

    // 3. stateful dedup across live micro-batches
    val root = java.nio.file.Files.createTempDirectory("sdl").toString
    val in = s"$root/in"; java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      """{"msg_id":"m1","payload":"a"}
        |{"msg_id":"m2","payload":"b"}
        |{"msg_id":"m1","payload":"dup"}""".stripMargin)
    val st = spark.readStream.schema("msg_id STRING, payload STRING").json(in).as[ProbeMsg]
    val q = graft.streaming.StatefulDedup.firstSighting[ProbeMsg](st, _.msg_id)
      .writeStream.option("checkpointLocation", s"$root/ck")
      .outputMode("append").format("memory").queryName("probe_out").start()
    q.processAllAvailable()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
      """{"msg_id":"m2","payload":"redeliver"}
        |{"msg_id":"m3","payload":"c"}""".stripMargin)
    q.processAllAvailable(); q.stop()
    println("deduped stream:")
    spark.table("probe_out").orderBy("msg_id").show(false)
    spark.stop()
  }
}
case class ProbeMsg(msg_id: String, payload: String)
