package graft

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Reference-faithful fixture writers (FIXTURES.md family A). */
object TestFixtures {

  /** A1 — S3 inventory gzip CSV: every field double-quoted, no header
    * (ListProducer/manifest.json:6). Rows straddle every histogram
    * threshold, include a URL-encoded '+'-bearing key, a >5e9 object,
    * and one malformed (<7 commas) line (ListProducer.py:41-42). */
  def writeS3InventoryGz(dir: String, name: String,
                         rows: Seq[(String, String, Long, String, String, String, String, String)],
                         malformedLines: Seq[String] = Nil): String = {
    Files.createDirectories(Paths.get(dir))
    val path = s"$dir/$name.csv.gz"
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"))
    rows.foreach { case (b, k, sz, lm, etag, sc, mp, rs) =>
      w.write(Seq(b, k, sz.toString, lm, etag, sc, mp, rs)
        .map(f => "\"" + f + "\"").mkString(","))
      w.newLine()
    }
    malformedLines.foreach { l => w.write(l); w.newLine() }
    w.close()
    path
  }

  val defaultInventoryRows: Seq[(String, String, Long, String, String, String, String, String)] = Seq(
    ("srcb", "plain/key.bin", 500000L, "2017-12-24T01:02:03.000Z",
      "11111111111111111111111111111111", "STANDARD", "false", ""),
    ("srcb", "space%20and+plus.bin", 1000000L, "2017-12-24T01:02:04.000Z",
      "22222222222222222222222222222222", "STANDARD", "false", ""),
    ("srcb", "at-5mb.bin", 5000000L, "2017-12-24T02:02:03.000Z",
      "33333333333333333333333333333333", "STANDARD_IA", "false", "COMPLETED"),
    ("srcb", "just-over-5mb.bin", 5000001L, "2017-12-24T03:02:03.000Z",
      "44444444444444444444444444444444", "STANDARD", "true", ""),
    ("srcb", "big-1e8.bin", 100000000L, "2017-12-24T04:02:03.000Z",
      "55555555555555555555555555555555-12", "STANDARD", "true", ""),
    ("srcb", "huge-2e9.bin", 2000000000L, "2017-12-24T05:02:03.000Z",
      "66666666666666666666666666666666-40", "STANDARD", "true", ""),
    ("srcb", "oversize-6e9.bin", 6000000000L, "2017-12-24T06:02:03.000Z",
      "77777777777777777777777777777777-99", "STANDARD", "true", ""))

  /** A2 — manifest.json (multi-line nested doc). */
  def writeManifest(dir: String, files: Seq[(String, Long, String)]): String = {
    Files.createDirectories(Paths.get(dir))
    val filesJson = files.map { case (k, s, m) =>
      s"""{"key": "$k", "size": $s, "MD5checksum": "$m"}"""
    }.mkString(",\n    ")
    val doc =
      s"""{
         |  "sourceBucket": "srcb",
         |  "destinationBucket": "dstb",
         |  "version": "2016-11-30",
         |  "fileFormat": "CSV",
         |  "fileSchema": "Bucket, Key, Size, LastModifiedDate, ETag, StorageClass, IsMultipartUploaded, ReplicationStatus",
         |  "files": [
         |    $filesJson
         |  ]
         |}""".stripMargin
    val p = s"$dir/manifest.json"
    Files.writeString(Paths.get(p), doc)
    p
  }

  /** A3 — Azure inventory CSV with header + one garbage Content-Length
    * (largeInventoryDiffToSQS.py:106-111). */
  def writeAzureInventoryCsv(dir: String, name: String): String = {
    Files.createDirectories(Paths.get(dir))
    val p = s"$dir/$name.csv"
    val lines = Seq(
      "Name,Creation-Time,Last-Modified,Etag,Content-Length,Content-MD5,BlobType,AccessTier,ArchiveStatus",
      "blob/a.txt,2021-01-01T00:00:00Z,2021-01-02T00:00:00Z,0x8D1,123456,abc=,BlockBlob,Hot,",
      "blob/b.txt,2021-01-01T00:00:00Z,2021-01-03T00:00:00Z,0x8D2,not-a-number,def=,BlockBlob,Cool,",
      "blob/c.txt,2021-01-02T00:00:00Z,2021-01-04T00:00:00Z,0x8D3,999,ghi=,BlockBlob,Hot,")
    Files.writeString(Paths.get(p), lines.mkString("\n"))
    p
  }
}
