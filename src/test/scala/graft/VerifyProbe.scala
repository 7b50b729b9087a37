package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    import graft.sinks.VersionedStore

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- MVCC versioned store at sf0.1 volume: 600k lineitem rows
    // keyed by (l_orderkey, l_linenumber), 64 buckets, four epochs
    val sf01 = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
        floor(col("l_extendedprice")).cast("bigint").as("v"))
      .groupBy("k1", "k2").agg(max("v").as("v"))
    val root = java.nio.file.Files.createTempDirectory("vprobe").toString + "/store"

    val e1 = time("e1 bulk load") {
      VersionedStore.upsert(li, Seq("k1", "k2"), root, nBuckets = 64)
    }
    val e2 = time("e2 upsert 10%") {
      VersionedStore.upsert(
        li.filter(col("k1") % 10 === 0).withColumn("v", col("v") + 1L),
        Seq("k1", "k2"), root)
    }
    val e3 = time("e3 delete 5%") {
      VersionedStore.delete(li.filter(col("k1") % 20 === 0)
        .select("k1", "k2"), root)
    }
    val e4 = time("e4 absent-key delete") {
      VersionedStore.delete(Seq((-1L, -1)).toDF("k1", "k2"), root)
    }
    require(e1 == 1 && e2 == 2 && e3 == 3 && e4 == 3,
      s"epochs: $e1 $e2 $e3 $e4 (absent-key delete must not commit)")

    val base = li.count()
    val n1 = time("readAsOf 1") { VersionedStore.readAsOf(spark, root, 1).count() }
    val n3 = time("readAsOf 3") { VersionedStore.readAsOf(spark, root, 3).count() }
    val del = li.filter(col("k1") % 20 === 0).count()
    require(n1 == base, s"epoch-1 snapshot: $n1 vs $base")
    require(n3 == base - del, s"epoch-3 snapshot: $n3 vs ${base - del}")

    val cdc = time("changelog 1->3") {
      VersionedStore.changelog(spark, root, 1, 3)
        .groupBy("change").count().as[(String, Long)].collect().toMap
    }
    val upd = li.filter(col("k1") % 10 === 0 && col("k1") % 20 =!= 0).count()
    require(cdc("delete") == del && cdc("update") == upd && !cdc.contains("insert"),
      s"cdc counts: $cdc vs del=$del upd=$upd")

    // CDC pruning: epoch 4 touches one key -> reads stay bucket-local
    VersionedStore.upsert(Seq((1L, 1, 7L)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"), root)
    val one = VersionedStore.changelog(spark, root, 3, 4)
    val bucketsRead = one.inputFiles
      .flatMap(_.split("/").find(_.matches("^b\\d{5}$"))).toSet
    require(bucketsRead.size == 1, s"CDC must prune untouched buckets: $bucketsRead")

    val rep = time("vacuum retain 3") { VersionedStore.vacuum(root, 3) }
    println(s"vacuum: deleted=${rep.deletedGens} kept=${rep.keptGens}")
    require(rep.deletedGens > 0, "vacuum must GC shadowed generations")
    val n3after = VersionedStore.readAsOf(spark, root, 3).count()
    require(n3after == n3, s"retained snapshot broken by vacuum: $n3after vs $n3")

    println(s"PROBE OK  store=$root epochs=4 base=$base cdc=$cdc")
    spark.stop()
  }
}
