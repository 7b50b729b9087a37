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
      .withColumn("sh", graft.ops.ApproxDedup.wordNgrams(col("text"), 2))
    val sets = docs.select(col("doc_id"), col("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize sets")(println(sets.count()))
    val sig = graft.ops.ApproxDedup.minhashSignature(sets, "doc_id", "sh", 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize sig")(println(sig.count()))
    val cand = graft.ops.ApproxDedup.lshCandidatePairs(sig, "doc_id", 4, 4)
    time("candidates")(println(cand.count()))
    val joined = cand
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("set_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("set_b")), Seq("id_b"))
      .withColumn("jac", graft.ops.ApproxDedup.jaccard(col("set_a"), col("set_b")))
    time("verify join")(println(joined.count()))
    spark.stop()
  }
}
