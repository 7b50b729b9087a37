package graft

/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = Queries.all(name)(spark, dir).count()
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
