package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One media blob: opaque bytes + typed envelope. At 100 TB the `media`
  * column stays opaque to Catalyst (binary) — only the envelope columns
  * (doc_id, kind) are shuffled/grouped; blobs move once, scan-side. */
case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

/** Decoded (stubbed) media metadata — the schema a real decoder would
  * produce; deterministic here so the DuckDB oracle can verify it. */
case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, quality_ok: Boolean)

/** One sampled frame of a media blob. */
case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** One audio chunk with its time span (overlapping windows). */
case class AudioChunk(doc_id: Long, chunk_idx: Int, start_ms: Long,
    end_ms: Long, samples: Array[Byte])

/** Extracted per-frame feature vector (stub: byte-histogram moments). */
case class FrameFeature(doc_id: Long, frame_idx: Int, feature: Array[Float])

/** Metadata from a REAL image decode (javax.imageio): dimensions plus a
  * red-channel pixel checksum only an actual pixel read can produce. */
case class PngMeta(doc_id: Long, width: Int, height: Int, px_sum: Long)

/** Multimodal-column plumbing for training-data pipelines: opaque binary
  * media columns with typed metadata, decoded per-partition.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries in this container); everything around it — the typed
  * `Dataset[MediaRow]` envelope, `mapPartitions` batch shape (decoder
  * state initialized once per partition, streamed row-wise), and the
  * resulting metadata schema — is the real production plumbing. Swap
  * `decodeStub` for a JNI/ffmpeg/JPEG decoder and nothing else changes.
  */
object Multimodal {

  /** STUB decoder: metadata derived deterministically from the byte length
    * alone (byte-count formulas are the only ones both the engine — which
    * sees bytes — and the text-level DuckDB oracle can compute identically
    * for any input; a first-BYTE formula diverges from the oracle's
    * first-CHARACTER ascii() on multi-byte UTF-8). A real decoder parses
    * the container format. */
  def decodeStub(m: MediaRow): MediaMeta = {
    val n = m.media.length
    MediaMeta(m.doc_id, m.kind, n,
      width = 320 + (n % 320),
      // long arithmetic: n * 7 overflows Int beyond ~306 MB blobs, and the
      // oracle computes in BIGINT
      height = 240 + ((n.toLong * 7) % 240).toInt,
      quality_ok = n >= 64)
  }

  /** Per-partition decode: the iterator shape lets a real implementation
    * allocate one decoder per partition (not per row) and stream blobs
    * through it — the batching contract that matters at scale. */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: val decoder = Decoder.open() here, once per partition
      it.map(decodeStub)
    }
  }

  /** Frame sampling: one media blob → every `everyN`-th fixed-size chunk
    * ("frame"). The one-to-many iterator shape (flatMap inside
    * mapPartitions) is exactly how a real video decoder streams frames out
    * without materializing all of them per row — memory stays bounded by
    * one frame, not one video. STUB: frames are 256-byte slices. */
  def frameSample(ds: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    val frameBytes = 256
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = (m.media.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).filter(_ % everyN == 0).map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, m.media.length)
          FrameRow(m.doc_id, i, java.util.Arrays.copyOfRange(m.media, from, until))
        }
      }
    }
  }

  /** Audio chunking: OVERLAPPING fixed-duration windows (window > hop) —
    * the ASR-training shape (e.g. 30 s windows on a 10 s hop so utterances
    * spanning a boundary appear whole in some window), unlike frameSample's
    * disjoint chunks. Same bounded one-to-many iterator: memory holds one
    * chunk, not one recording. STUB clock: `bytesPerSec` bytes = 1 s of
    * audio; a real implementation reads the container's sample rate. */
  def audioChunks(ds: Dataset[MediaRow], windowMs: Long, hopMs: Long,
      bytesPerSec: Int = 16): Dataset[AudioChunk] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val totalMs = m.media.length.toLong * 1000 / bytesPerSec
        Iterator.iterate(0L)(_ + hopMs).takeWhile(_ < totalMs)
          .zipWithIndex.map { case (startMs, i) =>
            val endMs = math.min(startMs + windowMs, totalMs)
            val from = (startMs * bytesPerSec / 1000).toInt
            val until = math.min((endMs * bytesPerSec / 1000).toInt, m.media.length)
            AudioChunk(m.doc_id, i, startMs, endMs,
              java.util.Arrays.copyOfRange(m.media, from, math.max(from, until)))
          }
      }
    }
  }

  /** Media resize/transcode. STUB: deterministic byte-decimation to
    * `targetBytes` (every k-th byte, k = ceil(n/target)); a real pipeline
    * runs an image scaler here. Shape notes: media-in → media-out keeps
    * the envelope schema, so resize composes with decode/frameSample, and
    * the per-partition iterator lets a real scaler reuse one native
    * context across blobs. */
  def resize(ds: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: val scaler = Scaler.open() once per partition
      it.map { m =>
        val n = m.media.length
        if (n <= targetBytes) m
        else {
          val step = math.ceil(n.toDouble / targetBytes).toInt
          val out = Iterator.range(0, n, step).map(m.media(_)).toArray
          MediaRow(m.doc_id, m.kind, out)
        }
      }
    }
  }

  /** Per-frame feature extraction. STUB: 4 byte-distribution moments; a
    * real pipeline runs an image model here. Same per-partition batch
    * shape: model loads once per partition, frames stream through. */
  def featurize(ds: Dataset[FrameRow]): Dataset[FrameFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: val model = Model.load() once per partition
      it.map { f =>
        val n = math.max(1, f.frame.length)
        var sum = 0.0; var sumSq = 0.0; var min = 255.0; var max = 0.0
        f.frame.foreach { b =>
          val v = (b & 0xff).toDouble
          sum += v; sumSq += v * v
          if (v < min) min = v
          if (v > max) max = v
        }
        val mean = sum / n
        val variance = sumSq / n - mean * mean
        FrameFeature(f.doc_id, f.frame_idx,
          Array(mean.toFloat, variance.toFloat, min.toFloat, max.toFloat))
      }
    }
  }

  /** REAL image decode (no stub): `javax.imageio` is in every JDK, so the
    * C13 envelope gets one genuine codec leg — PNG bytes in the binary
    * column are parsed, pixels read, and the decoded metadata is
    * oracle-checked against the generator's ground-truth formulas. The
    * per-partition iterator shape is identical to the stubbed decoders:
    * swap ImageIO for a JNI/ffmpeg handle and nothing else changes.
    * `px_sum` sums the red channel of every pixel — a checksum that only
    * a real decode of every pixel can produce. */
  def decodePng(ds: Dataset[MediaRow]): Dataset[PngMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // one ImageIO config per partition; the memory-backed stream avoids
      // the default disk cache (a per-row tmp file at scale)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.media))
        require(img != null, s"doc ${m.doc_id}: not a decodable image")
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += (img.getRGB(x, y) >> 16) & 0xff // red channel
            x += 1
          }
          y += 1
        }
        PngMeta(m.doc_id, img.getWidth, img.getHeight, sum)
      }
    }
  }

  /** Deterministic PNG corpus: per doc, a (1 + doc_id%8) × (1 + n_chars%8)
    * gradient image whose red channel at (x, y) is
    * (doc_id·31 + 7x + 13y) mod 256, ENCODED through the real PNG codec
    * executor-side. PNG is lossless, so decodePng must recover exactly
    * these formulas — the decode leg's ground truth. */
  def pngCorpus(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (docId, nChars) =>
          val w = (1 + docId % 8).toInt
          val h = (1 + nChars % 8).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((docId * 31 + 7 * x + 13 * y) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRow(docId, "image/png", out.toByteArray)
        }
      }
  }

  /** documents.text bytes as a stand-in media corpus → decoded metadata. */
  private def multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), lit("image").as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
    decodeMeta(media).toDF()
  }

  private def mediaRows(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), lit("video").as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Frame sampling counts per doc (every 2nd 256-byte frame) — the chunk
    * arithmetic is length-derived, so the oracle recomputes it from
    * strlen. */
  private def frames(s: SparkSession, d: String): DataFrame =
    frameSample(mediaRows(s, d), everyN = 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("last_idx"))

  /** Chunk counts + covered span per doc (2 s windows, 0.5 s hop) — the
    * windowing arithmetic is all integer and length-derived, so the oracle
    * recomputes it from strlen. */
  private def audio(s: SparkSession, d: String): DataFrame =
    audioChunks(mediaRows(s, d), windowMs = 2000, hopMs = 500)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("end_ms")).as("span_ms"))

  /** WebDataset-style shard planning: assign media rows to ~4 KB shards
    * per source (id-ordered prefix-sum bucketing: shard = exclusive
    * cumulative bytes div budget — deterministic, one-pass, each shard
    * overshoots by at most one item) and emit the per-shard manifest
    * (count, bytes, id range) a tar-writer consumes. This is the
    * planning half of multimodal dataset prep: balanced shards are what
    * make sequential-read training loaders work; the blob bytes
    * themselves never move here. Exact integers end to end. Scale
    * shape: the cumsum window partitions by source (shards are
    * per-source by design — no global sort), manifest rows are
    * shards-cardinality. */
  private def shardPlan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("bigint").as("bytes"))
      .withColumn("cum_excl", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("shard_id", expr("cum_excl div 4096"))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** PNG encode → decode round trip over the real codec; the oracle
    * recomputes the generator's formulas (closed-form px_sum — the double
    * pixel sum collapses: Σ_x Σ_y ((a + 7x + 13y) mod 256), expanded
    * row-by-row in SQL via a bounded 8×8 grid join). */
  private def imageDecode(s: SparkSession, d: String): DataFrame =
    decodePng(pngCorpus(Tables.documents(s, d))).toDF()

  /** Resize card (C13a promotion, r14): the byte-decimation transcode's
    * OUTPUT SIZE law, per doc — step = ceil(n/target), n_out =
    * ceil(n/step), pass-through below target — over the REAL resize
    * operator (the arithmetic-contract shape C13b/C13c use: the
    * decimation arithmetic is integer and length-derived, so the oracle
    * recomputes it from strlen; the byte CONTENT stays suite-checked —
    * MultimodalSpec asserts every k-th byte — because DuckDB cannot
    * byte-index multi-byte text). */
  private def resizeCard(s: SparkSession, d: String): DataFrame =
    resize(mediaRows(s, d), targetBytes = 128).toDF()
      .select(col("doc_id"), col("kind"),
        length(col("media")).cast("bigint").as("n_out"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_resize" -> resizeCard _,
    "q_multimodal" -> multimodal _,
    "q_frames" -> frames _,
    "q_audio_chunks" -> audio _,
    "q_shard_plan" -> shardPlan _,
    "q_image_decode" -> imageDecode _
  )

  val oracles: Map[String, String] = Map(
    // the decimation size law from byte length: step = ceil(n/128),
    // n_out = ceil(n/step), identity below the target (integer floor
    // division throughout -- exact in both engines)
    "q_resize" ->
      """SELECT doc_id, 'video' AS kind,
        | CAST(CASE WHEN strlen(text) <= 128 THEN strlen(text)
        |  ELSE (strlen(text) + ((strlen(text) + 127) // 128) - 1)
        |    // ((strlen(text) + 127) // 128) END AS BIGINT) AS n_out
        |FROM documents""".stripMargin,
    "q_image_decode" ->
      """WITH d AS (
        | SELECT doc_id, CAST(1 + doc_id % 8 AS INTEGER) AS w,
        |  CAST(1 + n_chars % 8 AS INTEGER) AS h
        | FROM documents),
        |px AS (
        | SELECT d.doc_id, d.w, d.h,
        |  (d.doc_id * 31 + 7 * x.i + 13 * y.i) % 256 AS g
        | FROM d
        | JOIN (SELECT unnest(range(8)) AS i) x ON x.i < d.w
        | JOIN (SELECT unnest(range(8)) AS i) y ON y.i < d.h)
        |SELECT doc_id, w AS width, h AS height,
        | CAST(sum(g) AS BIGINT) AS px_sum
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id, 'image' AS kind,
        | CAST(strlen(text) AS INTEGER) AS n_bytes,
        | CAST(320 + strlen(text) % 320 AS INTEGER) AS width,
        | CAST(240 + (strlen(text) * 7) % 240 AS INTEGER) AS height,
        | strlen(text) >= 64 AS quality_ok
        |FROM documents""".stripMargin,
    "q_frames" ->
      """WITH f AS (
        | SELECT doc_id,
        |  CAST(ceil(strlen(text) / 256.0) AS INTEGER) AS n_frames
        | FROM documents
        | WHERE strlen(text) > 0) -- empty docs produce no frames engine-side
        |SELECT doc_id,
        | CAST(ceil(n_frames / 2.0) AS BIGINT) AS n_sampled,
        | CAST(((n_frames - 1) // 2) * 2 AS INTEGER) AS last_idx
        |FROM f""".stripMargin,
    "q_shard_plan" ->
      """WITH b AS (
        | SELECT doc_id, source, CAST(strlen(text) AS BIGINT) AS bytes
        | FROM documents),
        |c AS (
        | SELECT *, coalesce(sum(bytes) OVER (PARTITION BY source
        |   ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        | FROM b)
        |SELECT source, CAST(cum_excl // 4096 AS BIGINT) AS shard_id,
        | count(*) AS n_items,
        | CAST(sum(bytes) AS BIGINT) AS shard_bytes,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q_audio_chunks" ->
      """WITH a AS (
        | SELECT doc_id, (strlen(text) * 1000) // 16 AS total_ms
        | FROM documents WHERE strlen(text) > 0)
        |SELECT doc_id,
        | (total_ms + 499) // 500 AS n_chunks,
        | total_ms AS span_ms
        |FROM a""".stripMargin
  )
}
