package graft
import org.apache.spark.sql.functions._
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    // entry() with scaled thresholds — informative bucket spread now
    SparkEntry.entry(spark).show(false)
    // ORC normalization + a probe: unknown format name
    val root = java.nio.file.Files.createTempDirectory("orcdrive").toString
    TestFx2.writeGz(s"$root/csv")
    val orc = graft.sources.InventoryReader.normalizeTo(spark, s"$root/csv/*.csv.gz", s"$root/orc", "orc")
    println("orc rows=" + orc.count() + " dirs=" + new java.io.File(s"$root/orc").listFiles().map(_.getName).filter(_.startsWith("Bucket=")).mkString(","))
    try graft.sources.InventoryReader.normalizeTo(spark, s"$root/csv/*.csv.gz", s"$root/xx", "not-a-format")
    catch { case e: Exception => println("bad format rejected: " + e.getMessage.linesIterator.next().take(100)) }
    spark.stop()
  }
}
object TestFx2 {
  import java.io._; import java.util.zip.GZIPOutputStream
  def writeGz(dir: String): Unit = {
    new File(dir).mkdirs()
    val w = new BufferedWriter(new OutputStreamWriter(new GZIPOutputStream(new FileOutputStream(s"$dir/s.csv.gz")), "UTF-8"))
    Seq(("b1","k1",100L), ("b2","k2",200L)).foreach { case (b,k,s) =>
      w.write(Seq(b,k,s.toString,"2017-12-24T01:02:03.000Z","e","STANDARD","false","").map(f => "\"" + f + "\"").mkString(",")); w.newLine() }
    w.close()
  }
}
