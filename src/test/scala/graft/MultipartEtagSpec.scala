package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.MultipartEtag

class MultipartEtagSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  test("single-PUT etag is the plain md5") {
    val b = "hello world".getBytes("UTF-8")
    assert(MultipartEtag.etagOf(b, 1 << 20, isMultipart = false) == md5hex(b))
    assert(MultipartEtag.etagOf(b, 1 << 20) == md5hex(b)) // size-inferred
  }

  test("N-part etag is md5 of concatenated part digests + -N") {
    val b = ("a" * 10 + "b" * 10 + "c" * 4).getBytes("UTF-8")
    val parts = b.grouped(10).toArray
    val digests = parts.flatMap(p => MessageDigest.getInstance("MD5").digest(p))
    val expect = md5hex(digests) + "-3"
    assert(MultipartEtag.etagOf(b, 10, isMultipart = true) == expect)
    assert(MultipartEtag.etagOf(b, 10) == expect) // size-inferred multipart
  }

  test("1-part MULTIPART upload gets the digest-of-digests -1 form") {
    val b = "small".getBytes("UTF-8")
    val inner = MessageDigest.getInstance("MD5").digest(b)
    assert(MultipartEtag.etagOf(b, 1 << 20, isMultipart = true) == md5hex(inner) + "-1")
    // and differs from the single-PUT form
    assert(MultipartEtag.etagOf(b, 1 << 20, isMultipart = true)
      != MultipartEtag.etagOf(b, 1 << 20, isMultipart = false))
  }

  test("aggregation form matches the scalar form part-for-part") {
    val body = "0123456789" * 5 // 50 bytes, 3 parts of 20
    val parts = body.getBytes("UTF-8").grouped(20).toArray
    val df = parts.zipWithIndex
      .map { case (p, i) => (i + 1, md5hex(p)) }.toSeq.toDF("pn", "d")
    val got = df.agg(
      MultipartEtag.etagFromPartDigests($"pn", $"d", lit(true))).as[String].head()
    assert(got == MultipartEtag.etagOf(body.getBytes("UTF-8"), 20, isMultipart = true))
  }

  test("column form routes on the isMultipart flag") {
    val rows = Seq(("x", false), ("x", true)).toDF("t", "mp")
    val got = rows.select(
      MultipartEtag.multipartEtag($"t".cast("binary"), 1 << 20, $"mp"))
      .as[String].collect().toSeq
    val b = "x".getBytes("UTF-8")
    assert(got == Seq(
      MultipartEtag.etagOf(b, 1 << 20, isMultipart = false),
      MultipartEtag.etagOf(b, 1 << 20, isMultipart = true)))
    assert(got(1).endsWith("-1"))
  }

  test("native multipart_etag_finish expression matches the UDF path, in codegen") {
    val body = "0123456789" * 5
    val parts = body.getBytes("UTF-8").grouped(20).toArray
    val df = parts.zipWithIndex
      .map { case (p, i) => (i + 1, md5hex(p)) }.toSeq.toDF("pn", "d")
    val native = df.agg(
      MultipartEtag.etagFromPartDigestsNative($"pn", $"d", lit(true))).as[String].head()
    val viaUdf = df.agg(
      MultipartEtag.etagFromPartDigests($"pn", $"d", lit(true))).as[String].head()
    assert(native == viaUdf)
    assert(native == MultipartEtag.etagOf(body.getBytes("UTF-8"), 20, isMultipart = true))
    // also reachable straight from SQL through the registered function
    val sql = spark.sql(
      "SELECT multipart_etag_finish(array(md5(binary('x'))), false)").as[String].head()
    assert(sql == md5hex("x".getBytes("UTF-8")))
    // 1-part multipart via SQL gets the -1 form
    val sql1 = spark.sql(
      "SELECT multipart_etag_finish(array(md5(binary('x'))), true)").as[String].head()
    assert(sql1.endsWith("-1"))
  }
}
