package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    // 1. how does events.parquet (INT64 nanos ntz) read?
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      println("events schema: " + ev.schema.simpleString)
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println("plain read failed: " + e.getMessage) }
    val ev2 = Tables.events(spark, "/root/testdata/sf0.001")
    println("normalized: " + ev2.schema.simpleString)
    ev2.select(min(col("ts_sec")), max(col("ts_sec"))).show(false)
    // 2. lineitem shipdate type
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    println("lineitem: " + li.schema.simpleString)
    li.select(col("l_shipdate")).show(2, false)
    spark.stop()
  }
}
