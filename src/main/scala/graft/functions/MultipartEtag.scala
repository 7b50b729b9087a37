package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F7 — AWS multipart ETag (AzureEtagCheck/etag_app.py:26-52,104-124).
  *
  * Semantics: split the object into fixed-size parts; ETag of a
  * single-part object is `hex(md5(bytes))`; of an N-part object it is
  * `hex(md5(md5(part1) || md5(part2) || ...)) + "-" + N` where `||` is
  * raw-byte concatenation of the 16-byte digests.
  *
  * Implemented distributed-friendly: the per-part md5 runs as the
  * codegen'd built-in `md5` over a `transform` of byte slices, so only
  * the final digest-of-digests needs a (tiny, 16·N-byte input) UDF.
  */
object MultipartEtag {

  private def md5Bytes(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(b)

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  /** Reference-exact scalar implementation (used by the UDF and tests). */
  def etagOf(bytes: Array[Byte], partSize: Int): String = {
    require(partSize > 0, "partSize must be positive")
    if (bytes.length <= partSize) hex(md5Bytes(bytes))
    else {
      val parts = bytes.grouped(partSize).toArray
      val digests = parts.flatMap(md5Bytes)
      hex(md5Bytes(digests)) + "-" + parts.length
    }
  }

  /** Column form: multipart etag of a binary column with the given part
    * size. Whole object bytes must fit in one row (S3 parts are ≤5 GiB;
    * at 100 TB scale the per-part digests are computed where the parts
    * are read — see [[graft.ops.Verification]] for the ranged-read form). */
  def multipartEtag(data: Column, partSize: Int): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else etagOf(b, partSize))
    f(data)
  }

  /** Aggregation form for when parts arrive as rows `(partNumber, partMd5)`:
    * final = hex(md5(concat(digests ordered by partNumber))) + "-" + n,
    * or plain single digest when n == 1. The ordered digest-concat is an
    * `array_sort(collect_list(struct(...)))` — shuffle-free beyond the
    * groupBy, and each group's state is 16·N bytes, not the object bytes. */
  def etagFromPartDigests(partNum: Column, partMd5Hex: Column): Column = {
    val digestsOrdered = transform(
      array_sort(collect_list(struct(partNum.as("n"), partMd5Hex.as("d")))),
      s => s.getField("d"))
    val finish = udf { hexes: Seq[String] =>
      if (hexes == null || hexes.isEmpty) null
      else if (hexes.size == 1) hexes.head
      else {
        val raw = hexes.toArray.flatMap(h =>
          h.grouped(2).map(Integer.parseInt(_, 16).toByte))
        hex(md5Bytes(raw)) + "-" + hexes.size
      }
    }
    finish(digestsOrdered)
  }
}
