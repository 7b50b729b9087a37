package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    Queries.all("q20_lang_id")(spark, "/root/testdata/sf0.1").count() // warm
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Queries.all("q26_embed_near_dup")(spark, "/root/testdata/sf0.1").count()
      println(f"[t] q26 run$i ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
