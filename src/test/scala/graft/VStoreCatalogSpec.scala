package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** The MVCC store family as a Spark SQL catalog (round-15): plain
  * table names under a warehouse root, NATIVE `VERSION AS OF` /
  * `TIMESTAMP AS OF` time travel, the whole vstore read discipline
  * riding along — and read-only DDL/write posture. */
class VStoreCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("SQL catalog: names, time travel, pushdown, read-only posture") {
    val wh = tmpDir("vcat_wh")
    // two stores in the warehouse; `events` gets two stamped epochs
    val t1 = 1700000000000L
    val t2 = 1700000600000L
    VersionedStore.upsert((1L to 100L).map(k => (k, k * 2L)).toDF("k", "v"),
      Seq("k"), s"$wh/events", nBuckets = 8, tsMillis = t1)
    VersionedStore.upsert(Seq((7L, 777L)).toDF("k", "v"),
      Seq("k"), s"$wh/events", tsMillis = t2)
    VersionedStore.upsert((1L to 5L).map(k => (k, s"n$k")).toDF("k", "name"),
      Seq("k"), s"$wh/dims", nBuckets = 2, tsMillis = t1)

    spark.conf.set("spark.sql.catalog.gstore",
      classOf[graft.connectors.GraftVStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstore.root", wh)
    try {
      // current snapshot by plain name
      val cur = spark.sql("SELECT k, v FROM gstore.events ORDER BY k")
        .as[(Long, Long)].collect().toMap
      assert(cur.size == 100 && cur(7L) == 777L)

      // native VERSION AS OF = the epoch
      val e1 = spark.sql(
        "SELECT k, v FROM gstore.events VERSION AS OF 1 ORDER BY k")
        .as[(Long, Long)].collect().toMap
      assert(e1(7L) == 14L && e1.size == 100,
        "VERSION AS OF must serve the epoch-1 snapshot")

      // native TIMESTAMP AS OF resolves through epochAt (commit stamps)
      val mid = java.time.Instant.ofEpochMilli(t1 + 1000L).toString
      val byTs = spark.sql(
        s"SELECT k, v FROM gstore.events TIMESTAMP AS OF '$mid' ORDER BY k")
        .as[(Long, Long)].collect().toMap
      assert(byTs(7L) == 14L,
        "a timestamp between the commits must serve epoch 1")

      // the vstore read discipline rides along: a key probe through
      // pure SQL plans ONE chain of 8
      val probe = spark.sql("SELECT v FROM gstore.events WHERE k = 42")
      assert(probe.as[Long].collect().toSeq == Seq(84L))
      val parts = probe.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.size
      }.sum
      assert(parts == 1, s"catalog key probe must plan one chain: $parts")

      // joins across catalog tables work like any SQL tables
      val joined = spark.sql(
        """SELECT e.k, e.v, d.name FROM gstore.events e
          |JOIN gstore.dims d ON e.k = d.k ORDER BY e.k""".stripMargin)
        .collect()
      assert(joined.length == 5 && joined.head.getString(2) == "n1")

      // SHOW TABLES lists the warehouse's stores
      val shown = spark.sql("SHOW TABLES IN gstore").collect()
        .map(_.getAs[String]("tableName")).toSet
      assert(shown == Set("events", "dims"), s"SHOW TABLES: $shown")

      // read-only posture: writes and DDL name the transactional API
      val ins = intercept[Exception] {
        spark.sql("INSERT INTO gstore.events VALUES (999, 1)")
      }
      val ddl = intercept[Exception] {
        spark.sql("CREATE TABLE gstore.fresh (k BIGINT, v BIGINT)")
      }
      assert((ins.getMessage + ddl.getMessage).contains("transactional API")
        || ins.getMessage.toLowerCase.contains("does not support")
        || ddl.getMessage.contains("transactional API"),
        s"writes must be refused loudly: ${ins.getMessage.take(200)}")

      // a missing table fails as a table-not-found, not a weird IO error
      val nf = intercept[Exception] {
        spark.sql("SELECT * FROM gstore.nope").collect()
      }
      assert(nf.getMessage.contains("nope"), nf.getMessage.take(200))

      // round-16 polish: a non-numeric VERSION AS OF names the epoch
      // contract instead of surfacing a raw NumberFormatException
      val badV = intercept[Exception] {
        spark.sql("SELECT * FROM gstore.events VERSION AS OF 'abc'")
          .collect()
      }
      val badMsg = badV.getMessage +
        Option(badV.getCause).map(_.getMessage).getOrElse("")
      assert(badMsg.contains("commit EPOCH") &&
        badMsg.contains("TIMESTAMP AS OF"),
        s"VERSION AS OF 'abc' must explain the contract: " +
          badMsg.take(300))

      // round-16: SHOW NAMESPACES / USE behave (flat default namespace)
      val ns = spark.sql("SHOW NAMESPACES IN gstore").collect()
        .map(_.getString(0)).toSet
      assert(ns == Set("default"), s"SHOW NAMESPACES: $ns")
      spark.sql("USE gstore")
      try {
        val viaUse = spark.sql("SELECT count(*) FROM events")
          .collect()(0).getLong(0)
        assert(viaUse == 100L, s"USE gstore must resolve bare names: $viaUse")
      } finally spark.sql("USE spark_catalog.default")
      val nsDdl = intercept[Exception] {
        spark.sql("CREATE NAMESPACE gstore.other")
      }
      assert(nsDdl.getMessage.contains("transactional API") ||
        nsDdl.getMessage.toLowerCase.contains("read-only"),
        nsDdl.getMessage.take(200))
    } finally {
      spark.conf.unset("spark.sql.catalog.gstore")
      spark.conf.unset("spark.sql.catalog.gstore.root")
    }
  }

  test("catalog reads never tear while a writer commits") {
    val wh = tmpDir("vcat_race")
    val store = s"$wh/live"
    def commitAll(mult: Long): Unit =
      VersionedStore.upsert(
        (1L to 200L).map(k => (k, k * mult)).toDF("k", "v"),
        Seq("k"), store, nBuckets = 8)
    commitAll(1L)
    spark.conf.set("spark.sql.catalog.grace",
      classOf[graft.connectors.GraftVStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.grace.root", wh)
    try {
      // a writer rewrites EVERY key with a fresh multiplier, over and
      // over, while the catalog is read repeatedly: each read must see
      // ONE multiplier across all 200 rows (epoch resolved once at
      // load + immutable committed files = snapshot isolation); a torn
      // read would mix multipliers within one result
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val writer = new Thread(() => {
        var m = 2L
        try while (!stop.get() && m < 60L) { commitAll(m); m += 1 }
        catch { case t: Throwable => writerErr.set(t) }
      })
      writer.start()
      try {
        (1 to 12).foreach { _ =>
          val rows = spark.sql("SELECT k, v FROM grace.live")
            .as[(Long, Long)].collect()
          assert(rows.length == 200, s"torn row count: ${rows.length}")
          val mults = rows.map { case (k, v) => v / k }.distinct
          assert(mults.length == 1 && rows.forall { case (k, v) =>
            v == k * mults.head },
            s"torn snapshot: multipliers ${mults.toSeq.sorted.take(5)}")
        }
      } finally { stop.set(true); writer.join(60000) }
      assert(writerErr.get() == null,
        s"writer must not fail: ${Option(writerErr.get()).map(_.getMessage)}")
    } finally {
      spark.conf.unset("spark.sql.catalog.grace")
      spark.conf.unset("spark.sql.catalog.grace.root")
    }
  }
}
