package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` payload columns plus typed metadata, with
  * decode / feature-extraction running partition-wise on the executors.
  *
  * The Spark-side shape is real and tested — schema, partition-local
  * batch iteration, typed output rows. The actual media decode is
  * STUBBED (this environment has no image/audio codecs): `fakeDecode`
  * derives deterministic pseudo-metadata from the payload bytes, and is
  * the single function a real deployment replaces with an
  * OpenCV/ffmpeg call. The surrounding plumbing (mapPartitions over a
  * typed Dataset, per-partition codec init, columnar re-entry) is
  * exactly what the real decoder would use.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])

  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      fake_width: Long,
      fake_height: Long,
      fake_frames: Long,
      content_md5: String)

  /** STUB decode — deterministic fake standing in for a codec call.
    * Real deployments replace exactly this function. */
  def fakeDecode(doc_id: Long, payload: Array[Byte], md: MessageDigest): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = doc_id,
      n_bytes = n,
      fake_width = n % 640,
      fake_height = n % 480,
      fake_frames = n / 1000 + 1,
      content_md5 = md.digest(payload).map("%02x".format(_)).mkString)
  }

  /** Attach a binary payload column (here synthesized from text — the
    * driver testdata has no media blobs; a real pipeline reads
    * `binaryFile` sources or parquet binary columns directly). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  case class Frame(
      doc_id: Long,
      frame_idx: Long,
      frame_md5: String,
      brightness: Long)

  /** Frame sampling: explode each media payload into every `stride`-th
    * frame with a per-frame feature — the video-curation primitive
    * (sample frames → embed/score → filter). Partition-wise like
    * [[decodeMeta]]; the STUBBED parts a real deployment replaces are
    * (a) the frame count/extraction (here `n_bytes/1000+1` fake frames,
    * frame content = md5(payload ++ ":idx")) with an ffmpeg seek-decode
    * and (b) the brightness feature (here the hash's first byte) with
    * the real pixel statistic. The fan-out shape — one input row to
    * n_frames/stride typed rows, streamed, never materializing a whole
    * video's frames — is exactly the production pattern. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   idCol: String, payloadCol: String, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(stride > 0)
    media
      .select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5") // per-partition codec init
        rows.flatMap { r =>
          val nFrames = r.payload.length.toLong / 1000 + 1
          (0L until nFrames by stride.toLong).iterator.map { i =>
            md.reset()
            val h = md.digest(r.payload ++ s":$i".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            Frame(r.doc_id, i, h, java.lang.Long.parseLong(h.substring(0, 2), 16))
          }
        }
      }
  }

  /** 60-bit dHash-style perceptual fingerprint over a decoded pixel
    * scanline, as a DataFrame op: (id, dhash: long).
    *
    * Real dHash: decode → grayscale → box-downsample to a (W+1)×H grid
    * → set bit (r,c) when cell (r,c) is brighter than its right
    * neighbor. Here the decode is the same honest stand-in as
    * [[fakeDecode]]: the payload's byte stream IS the scanline (one
    * byte = one pixel intensity — exact for the ASCII synthetic
    * fixtures), so the box-downsample (the actual perceptual step —
    * averaging over [n·c/66, n·(c+1)/66) slices) and the
    * neighbor-comparison hash run unmodified on real pixel rows when a
    * codec replaces the stub. Grid is 11×6 = 66 cells → 6 rows × 10
    * comparisons = 60 bits, the engine's fingerprint-width convention
    * ([[ApproxDedup.simhash]]), so [[ApproxDedup.simhashPairs]]'
    * Hamming band-bucket miner consumes these fingerprints as-is.
    *
    * Portability contract (the oracle replays every step):
    *  - cell boundaries are exact integral floor-divisions — the
    *    double `floor(n·c / 66)` is exact because n·c < 2^15 keeps the
    *    quotient well inside double precision;
    *  - brightness comparison is cross-multiplied (`sum_a·cnt_b >
    *    sum_b·cnt_a`) — no division, no rounding, no halfway cases;
    *  - empty cells (n < 66) contribute sum 0, count 0, so their
    *    comparisons are deterministically false on both engines. */
  def dhashSignatures(df: DataFrame, id: String, px: Column): DataFrame =
    df.select(col(id), call_function("dhash_sig", px).as("dhash"))

  /** The composable (66-cell `transform` + per-cell `aggregate` HOF)
    * form of [[dhashSignatures]] — row-local like the kernel but ~two
    * orders of magnitude off scan speed from per-row boxed position
    * arrays and interpreted lambdas. Kept as the executable
    * specification: DhashKernelSpec pins the native `dhash_sig` kernel
    * to this form on the driver fixtures. */
  def dhashSignaturesHof(df: DataFrame, id: String, px: Column): DataFrame = {
    val W = 11; val H = 6
    val cells = W * H
    val bits = (W - 1) * H // 60
    val n = length(px).cast("long")
    def bound(c: Column): Column = floor(n * c / lit(cells)).cast("long")
    val stats = transform(sequence(lit(0), lit(cells - 1)), c => {
      val st = bound(c); val en = bound(c + lit(1))
      struct(
        when(en > st,
          aggregate(sequence(st + lit(1L), en), lit(0L),
            (acc, p) => acc + ascii(px.substr(p.cast("int"), lit(1)))))
          .otherwise(lit(0L)).as("s"),
        (en - st).as("cnt"))
    })
    // two selects: the 66-cell downsample materializes ONCE per row,
    // then 60 bit comparisons read it — not 60 re-evaluations
    val withStats = df.select(col(id), stats.as("_cells"))
    def cs(i: Int): Column = col("_cells").getItem(i).getField("s")
    def cn(i: Int): Column = col("_cells").getItem(i).getField("cnt")
    val fp = (0 until bits).map { b =>
      val cell = b / (W - 1) * W + b % (W - 1)
      when(cs(cell) * cn(cell + 1) > cs(cell + 1) * cn(cell),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    withStats.select(col(id), fp.as("dhash"))
  }

  /** Deterministic stand-in for a lossy re-encode of the synthetic
    * scanline payload: same length, a few pixel values changed — the
    * perturbation class a perceptual hash must absorb (vs. append/crop,
    * which shifts every downsample boundary and rightly reads as a
    * DIFFERENT image to dHash). */
  def fakeReencode(px: Column): Column = concat(
    substring(px, 1, 10), lit("q"),
    substring(px, 12, 15), lit("z"),
    px.substr(lit(28), length(px)))

  /** Decode metadata partition-wise: one codec (here: MessageDigest)
    * instance per partition, streaming iteration — the executor never
    * materializes more than one payload row at a time beyond Spark's
    * own batching. This is the pattern a real image/audio decoder
    * plugs into. */
  def decodeMeta(spark: SparkSession, media: DataFrame,
                 idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    media
      .select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5") // per-partition "codec" init
        rows.map { r => md.reset(); fakeDecode(r.doc_id, r.payload, md) }
      }
  }
}
