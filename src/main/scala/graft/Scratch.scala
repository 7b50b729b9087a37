package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    // EventJson over real inventory-shaped rows, incl. the Delete dispatch (P8)
    val diffRows = Seq(
      ("sa1", "a/b.bin", 100L, "e1", "New"),
      ("sa1", "c d+e.bin", 200L, "e2", "Delete")
    ).toDF("sa", "name", "size", "etag", "variance")
    val typed = diffRows.withColumn("etype",
      when($"variance" === "Delete", lit("Microsoft.Storage.BlobDeleted"))
        .otherwise(lit("Microsoft.Storage.BlobCreated")))
    val out = graft.ops.EventJson.withEvent(typed, $"sa", $"name", $"size", $"etag",
      $"etype", lit("2021-06-01T00:00:00Z"))
    out.select("event_json").show(2, false)
    // probe: null name → what happens to id/url?
    val n = graft.ops.EventJson.withEvent(
      Seq(("sa1", null.asInstanceOf[String], 1L, "e")).toDF("sa", "name", "size", "etag"),
      $"sa", $"name", $"size", $"etag", lit("Microsoft.Storage.BlobCreated"),
      lit("2021-06-01T00:00:00Z"))
    n.select($"event.id", $"event.data.url").show(false)
    spark.stop()
  }
}
