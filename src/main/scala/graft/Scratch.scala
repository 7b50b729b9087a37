package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val big = (1 to 200000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k10", "A")).toDF("key", "tag")
    val t0 = System.nanoTime()
    val plain = big.join(small, Seq("key")).count()
    val t1 = System.nanoTime()
    val salted = graft.ops.Salting.saltedJoin(big, small, "key", 16, Seq($"v")).count()
    val t2 = System.nanoTime()
    println(f"plain=$plain (${(t1-t0)/1e9}%.2f s)  salted=$salted (${(t2-t1)/1e9}%.2f s)  equal=${plain == salted}")
    // salt distribution of the hot key
    big.filter($"key" === "hot").withColumn("_salt", pmod(hash($"v"), lit(16)))
      .groupBy("_salt").count().agg(min("count"), max("count")).show(false)
    spark.stop()
  }
}
