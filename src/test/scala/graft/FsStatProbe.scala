package graft
object FsStatProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.read.parquet("/root/testdata/sf0.01/nation.parquet").count()
    import scala.jdk.CollectionConverters._
    org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.iterator().asScala
      .foreach { ss =>
        println(s"SCHEME ${ss.getScheme}")
        ss.getLongStatistics.asScala.foreach(st =>
          println(s"  ${st.getName} = ${st.getValue}"))
      }
    println("ALLSTATS " + org.apache.hadoop.fs.FileSystem.getAllStatistics)
    spark.stop()
  }
}
