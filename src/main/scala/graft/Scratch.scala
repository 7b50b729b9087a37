package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $n ${(System.nanoTime()-t0)/1e9}%6.2f s ($r rows)")
    }
    // warm
    Queries.all("q20_lang_id")(spark, "/root/testdata/sf0.1").count()
    time("q26 run1")(Queries.all("q26_embed_near_dup")(spark, "/root/testdata/sf0.1").count())
    time("q26 run2")(Queries.all("q26_embed_near_dup")(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
