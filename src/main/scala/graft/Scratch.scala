package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $n%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("source") === "src0")
      .withColumn("blk", col("lang"))
      .withColumn("bigrams", graft.ops.ApproxDedup.wordNgrams(col("text"), 2))
      .select("doc_id", "blk", "bigrams").cache()
    println("docs: " + docs.count())
    val ex = docs.withColumn("sz", size(col("bigrams")))
      .select(col("doc_id"), col("blk"), col("sz"), explode(col("bigrams")).as("sh")).cache()
    time("explode count")(println("exploded: " + ex.count()))
    val a = ex.select(col("doc_id").as("id_a"), col("blk"), col("sz").as("sz_a"), col("sh"))
    val b = ex.select(col("doc_id").as("id_b"), col("blk"), col("sz").as("sz_b"), col("sh"))
    val j = a.join(b, Seq("blk", "sh")).filter(col("id_a") < col("id_b"))
    time("join count")(println("pairs rows: " + j.count()))
    val g = j.groupBy("id_a","id_b","sz_a","sz_b").agg(count(lit(1)).as("inter"))
    time("group count")(println("grouped: " + g.count()))
    spark.stop()
  }
}
