package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Fns, MultipartEtag}
import graft.ops.{Dedup, TaskFanout}

/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    println("ansi mode: " + spark.conf.get("spark.sql.ansi.enabled"))

    // 1. safeLong on garbage under ANSI
    val garbage = Seq("123", "garbage", "", "12.5", "-7", null).toDF("s")
    println("-- safeLong --")
    garbage.select($"s", Fns.safeLong($"s").as("v")).show(false)

    // 2. humanBytes boundaries
    val sizes = Seq(0L, 500L, 949L, 950L, 999L, 1000L, 999949L, 999950L,
      1500L, 123456789L, 5L * 1000 * 1000 * 1000, 2000000000000000L).toDF("b")
    println("-- humanBytes --")
    sizes.select($"b", Fns.humanBytes($"b").as("h")).show(false)

    // 3. Dedup.exact atomicity under tieBreak collisions
    val dup = Seq(
      ("a", 1, "y", 0),
      ("a", 1, "x", 9),
      ("a", 2, "z", 5),
      ("b", 3, "w", 7)
    ).toDF("k", "tie", "c1", "c2")
    println("-- Dedup.exact (expect whole row (a,1,x,9) — not a stitched (a,1,x,0)) --")
    Dedup.exact(dup, Seq("k"), "tie").orderBy("k").show(false)

    // 4. multipart etag: single-part multipart must be md5(md5(part)) + "-1"
    val bytes = "hello world".getBytes("UTF-8")
    println("plain put:        " + MultipartEtag.etagOf(bytes, 1 << 20, isMultipart = false))
    println("1-part multipart: " + MultipartEtag.etagOf(bytes, 1 << 20, isMultipart = true))
    println("2-part multipart: " + MultipartEtag.etagOf(bytes, 6, isMultipart = true))
    // expected plain md5 of "hello world": 5eb63bbbe01eeed093cb22bb8f5acdc3
    val parts = Seq((1, "hello world"), (1, "part-one")).toDF("pn", "body")
      .withColumn("d", md5($"body".cast("binary")))
    println("-- etagFromPartDigests, 1 part, isMultipart=true (expect ...-1) --")
    parts.groupBy($"body")
      .agg(MultipartEtag.etagFromPartDigests($"pn", $"d", lit(true)).as("etag"))
      .show(false)

    // 5. TaskFanout.pack ordering: payload sorts by orderKeys, not payload
    val tasks = Seq(
      (10L, "zzz", 3L),
      (10L, "aaa", 1L),
      (10L, "mmm", 2L)
    ).toDF("route", "payload_name", "ord")
    println("-- pack body (expect aaa(1), mmm(2), zzz(3) by ord — NOT alphabetical fluke: ord order IS aaa,mmm,zzz... use reversed) --")
    val tasks2 = Seq(
      (10L, "zzz", 1L),
      (10L, "aaa", 3L),
      (10L, "mmm", 2L)
    ).toDF("route", "payload_name", "ord")
    TaskFanout.pack(tasks2, $"route", Seq($"ord"), queues = 4, batchSize = 100)
      .show(false)
    // expect body order: zzz (ord 1), mmm (2), aaa (3)

    spark.stop()
  }
}
