package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.serve.DashboardServer

/** The UICenter serving layer end to end: a REAL HTTP round-trip
  * against the JDK-server endpoints, payloads parsed back through
  * Spark's own JSON reader and pinned against the direct DataFrame
  * queries. */
class DashboardServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("totalProgress and tasksGraph serve the Dashboard queries over HTTP") {
    // a 90-minute stat table: minute i landed (i+1) successes of 100B
    val t0 = 1700000000L / 60 * 60
    val stat = (0 until 90).map { i =>
      (t0 + i * 60L, 1, (i + 1).toLong, (i + 1) * 100L, 0L, 0L)
    }.toDF("start_time", "time_unit", "success_num", "success_size",
      "failed_num", "failed_size").localCheckpoint()
    val now = t0 + 89 * 60L // "now" inside the last landed minute
    val srv = new DashboardServer(() => stat, totalObjects = 10000L,
      totalSize = 1000000L, nowEpochSec = () => now)
    val port = srv.start()
    try {
      val tp = get(port, "/totalProgress")
      assert(tp.statusCode() == 200 &&
        tp.headers().firstValue("Access-Control-Allow-Origin")
          .orElse("") == "*")
      val tpDf = spark.read.json(Seq(tp.body()).toDS())
      val want = graft.ops.Dashboard
        .totalProgress(stat, 10000L, 1000000L).collect()(0)
      val row = tpDf.collect()(0)
      assert(row.getAs[Long]("total_success_num") ==
        want.getAs[Long]("total_success_num"))
      assert(row.getAs[Long]("elapsed_minutes") == 90L)
      assert(row.getAs[Long]("eta_minutes") ==
        want.getAs[Long]("eta_minutes"))

      val tg = get(port, "/tasksGraph")
      assert(tg.statusCode() == 200 && tg.body().startsWith("["))
      val tgDf = spark.read.json(Seq(tg.body()).toDS())
      assert(tgDf.count() == 60L, "zero-filled last-hour spine")
      // the last spine minute is "now"'s minute; the first 60-89
      // window minutes carry their landed counts
      val byMin = tgDf.select("start_time", "success_num")
        .as[(Long, Long)].collect().toMap
      assert(byMin(t0 + 89 * 60L) == 90L && byMin(t0 + 30 * 60L) == 31L)

      assert(get(port, "/nope").statusCode() == 404)

      // CORS preflight (round-14 ADVICE): a browser sending a custom
      // header preflights with OPTIONS — it must see 204 + the CORS
      // trio, or the advertised Allow-Origin:* is unusable
      val client = HttpClient.newHttpClient()
      val pre = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/totalProgress"))
          .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(pre.statusCode() == 204, s"preflight: ${pre.statusCode()}")
      assert(pre.headers().firstValue("Access-Control-Allow-Origin")
        .orElse("") == "*")
      assert(pre.headers().firstValue("Access-Control-Allow-Methods")
        .orElse("").contains("GET"))
      assert(pre.headers().firstValue("Access-Control-Allow-Headers")
        .orElse("") == "*")

      // and a real method violation names the allowed set (RFC 9110)
      val post = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/tasksGraph"))
          .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 405)
      assert(post.headers().firstValue("Allow").orElse("").contains("GET"),
        "405 must carry an Allow header")
    } finally srv.stop()
  }

  test("vstore provider serves time-travel dashboards: as-of epoch E") {
    // the stat table lives in the MVCC store: epoch 1 = the first 60
    // minutes, epoch 2 = 30 more minutes land. The reference's UICenter
    // can only read live DynamoDB; here /totalProgress@1 must replay
    // exactly the epoch-1 dashboard after epoch 2 commits.
    import graft.sinks.VersionedStore
    val root = tmpDir("dash_vstore") + "/stat"
    val t0 = 1700000000L / 60 * 60
    def statRows(n: Int) = (0 until n).map { i =>
      (t0 + i * 60L, 1, (i + 1).toLong, (i + 1) * 100L, 0L, 0L)
    }.toDF("start_time", "time_unit", "success_num", "success_size",
      "failed_num", "failed_size")
    VersionedStore.upsert(statRows(60), Seq("start_time", "time_unit"), root,
      nBuckets = 2)
    VersionedStore.upsert(statRows(90), Seq("start_time", "time_unit"), root)
    assert(VersionedStore.currentEpoch(root) == 2L)

    val now = t0 + 89 * 60L
    val asOf1 = new DashboardServer(
      DashboardServer.vstoreStat(spark, root, epoch = Some(1L)),
      totalObjects = 10000L, totalSize = 1000000L, nowEpochSec = () => now)
    val live = new DashboardServer(
      DashboardServer.vstoreStat(spark, root),
      totalObjects = 10000L, totalSize = 1000000L, nowEpochSec = () => now)
    val p1 = asOf1.start(); val p2 = live.start()
    try {
      val wantAsOf = graft.ops.Dashboard.totalProgress(
        VersionedStore.readAsOf(spark, root, 1L), 10000L, 1000000L)
        .collect()(0)
      val gotAsOf = spark.read.json(
        Seq(get(p1, "/totalProgress").body()).toDS()).collect()(0)
      assert(gotAsOf.getAs[Long]("total_success_num") ==
        wantAsOf.getAs[Long]("total_success_num"))
      assert(gotAsOf.getAs[Long]("total_success_num") == (1L to 60L).sum,
        "the as-of dashboard must not see epoch-2 minutes")

      val gotLive = spark.read.json(
        Seq(get(p2, "/totalProgress").body()).toDS()).collect()(0)
      assert(gotLive.getAs[Long]("total_success_num") == (1L to 90L).sum,
        "the live dashboard follows the current epoch")
    } finally { asOf1.stop(); live.stop() }
  }
}
