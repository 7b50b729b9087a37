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

  /** Reference-exact scalar implementation (used by the UDF and tests).
    *
    * @param isMultipart whether the object was originally uploaded via
    *   multipart upload. The reference branches on this flag
    *   (etag_app.py:116-124 via is_multipart_upload from PartsCount at
    *   :68-91): a multipart upload of a SINGLE part still gets the
    *   digest-of-digests form `hex(md5(md5(part))) + "-1"`, not the plain
    *   md5 — without the flag, real S3 "-1" ETags report false mismatches.
    *   When false, the object is single-PUT regardless of size relative
    *   to partSize, giving the plain md5 hex. */
  def etagOf(bytes: Array[Byte], partSize: Int, isMultipart: Boolean): String = {
    require(partSize > 0, "partSize must be positive")
    if (!isMultipart) hex(md5Bytes(bytes))
    else {
      val parts =
        if (bytes.isEmpty) Array(Array.empty[Byte])
        else bytes.grouped(partSize).toArray
      val digests = parts.flatMap(md5Bytes)
      hex(md5Bytes(digests)) + "-" + parts.length
    }
  }

  /** Size-inferred convenience: treats objects larger than one part as
    * multipart (the common case when no upload metadata is available). */
  def etagOf(bytes: Array[Byte], partSize: Int): String =
    etagOf(bytes, partSize, isMultipart = bytes.length > partSize)

  /** Column form: multipart etag of a binary column with the given part
    * size. Whole object bytes must fit in one row (S3 parts are ≤5 GiB;
    * at 100 TB scale the per-part digests are computed where the parts
    * are read — see the ranged-read aggregation form below).
    * @param isMultipart column marking objects uploaded via multipart
    *   (S3 inventory's IsMultipartUploaded flag) */
  def multipartEtag(data: Column, partSize: Int, isMultipart: Column): Column = {
    val f = udf((b: Array[Byte], m: Boolean) =>
      if (b == null) null else etagOf(b, partSize, m))
    f(data, coalesce(isMultipart, lit(false)))
  }

  def multipartEtag(data: Column, partSize: Int): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else etagOf(b, partSize))
    f(data)
  }

  /** Aggregation form for when parts arrive as rows `(partNumber, partMd5)`:
    * final = hex(md5(concat(digests ordered by partNumber))) + "-" + n.
    * The ordered digest-concat is an `array_sort(collect_list(struct(...)))`
    * — shuffle-free beyond the groupBy, and each group's state is 16·N
    * bytes, not the object bytes.
    *
    * @param isMultipart any-value-per-group column: when true, a 1-part
    *   group still gets the digest-of-digests `...-1` form (matching the
    *   reference's branch on the multipart flag, etag_app.py:116-124);
    *   when false a single part yields its plain digest. */
  def etagFromPartDigests(partNum: Column, partMd5Hex: Column,
                          isMultipart: Column): Column = {
    val digestsOrdered = transform(
      array_sort(collect_list(struct(partNum.as("n"), partMd5Hex.as("d")))),
      s => s.getField("d"))
    val finish = udf { (hexes: Seq[String], multi: Boolean) =>
      if (hexes == null || hexes.isEmpty) null
      else if (hexes.size == 1 && !multi) hexes.head
      else {
        val raw = hexes.toArray.flatMap(h =>
          h.grouped(2).map(Integer.parseInt(_, 16).toByte))
        hex(md5Bytes(raw)) + "-" + hexes.size
      }
    }
    finish(digestsOrdered, coalesce(first(isMultipart, ignoreNulls = true), lit(true)))
  }

  /** Back-compat overload: parts-as-rows are assumed to come from a
    * multipart upload only when there is more than one part. */
  def etagFromPartDigests(partNum: Column, partMd5Hex: Column): Column =
    etagFromPartDigests(partNum, partMd5Hex, lit(false))

  /** S13 — ranged-read part explosion: one row per partSize byte range
    * of a scanned blob, carrying the part's md5 (codegen'd builtin over
    * a binary substr — the reference downloads each range sequentially,
    * etag_app.py:104-114; here the slice runs where the bytes are).
    * Feeds [[etagFromPartDigests]]/[[etagFromPartDigestsNative]]. */
  def explodeParts(blob: org.apache.spark.sql.DataFrame, pathCol: String,
                   contentCol: String, partSize: Int): org.apache.spark.sql.DataFrame = {
    require(partSize > 0)
    blob.select(col(pathCol).as("path"), col(contentCol).as("content"))
      .withColumn("n_parts",
        greatest(ceil(length(col("content")).cast("double") / partSize).cast("int"),
          lit(1)))
      .withColumn("part_num", explode(sequence(lit(1), col("n_parts"))))
      .withColumn("part_md5",
        md5(col("content").substr((col("part_num") - 1) * partSize + 1, lit(partSize))))
      .select("path", "n_parts", "part_num", "part_md5")
  }

  /** Recompute full multipart ETags of staged files end to end:
    * binaryFile scan → ranged part rows → digest-of-digests aggregation
    * (the etag_app verification path as one distributed plan; no
    * executor ever holds more than one object's bytes, and the group
    * state is 16·N digest bytes). Requires [[graft.plans.GraftExtensions]]. */
  def etagOfFiles(spark: org.apache.spark.sql.SparkSession, glob: String,
                  partSize: Int): org.apache.spark.sql.DataFrame =
    explodeParts(spark.read.format("binaryFile").load(glob), "path", "content", partSize)
      .groupBy("path")
      .agg(etagFromPartDigestsNative(col("part_num"), col("part_md5"),
        col("n_parts") > 1).as("etag"))

  /** Native-expression variant of [[etagFromPartDigests]]: the finisher
    * is the codegen'd `multipart_etag_finish` Catalyst expression
    * ([[graft.plans.MultipartEtagFinish]]) instead of a Scala UDF — no
    * per-row serializer round-trip. Requires a session built with
    * [[graft.plans.GraftExtensions]]. */
  def etagFromPartDigestsNative(partNum: Column, partMd5Hex: Column,
                                isMultipart: Column): Column = {
    val digestsOrdered = transform(
      array_sort(collect_list(struct(partNum.as("n"), partMd5Hex.as("d")))),
      s => s.getField("d"))
    call_function("multipart_etag_finish", digestsOrdered,
      coalesce(first(isMultipart, ignoreNulls = true), lit(true)))
  }
}
