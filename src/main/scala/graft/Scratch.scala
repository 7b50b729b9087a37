package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    // full chain: events -> stat table -> dashboard payloads, on real testdata
    val ev = Queries.all("q08_stat_table")(spark, "/root/testdata/sf0.001")
    val stat = ev.cache()
    println("== totalProgress payload:")
    graft.ops.Dashboard.totalProgress(stat, totalObjects = 2000L,
      totalSize = 200000L).show(false)
    val lastMinute = stat.filter(col("time_unit") === 1)
      .agg(max("start_time")).first().getLong(0)
    println("== tasksGraph tail (last 5 of 60 slots):")
    graft.ops.Dashboard.tasksGraph(stat, lastMinute + 30)
      .orderBy(desc("start_time")).limit(5).orderBy("start_time").show(false)
    // probe: empty stat table -> payload degrades without crashing?
    val empty = stat.filter(lit(false))
    try {
      graft.ops.Dashboard.totalProgress(empty, 10L, 10L).show(false)
    } catch { case e: Exception => println("empty stat: " + e.getClass.getSimpleName + ": " + e.getMessage.take(80)) }
    spark.stop()
  }
}
