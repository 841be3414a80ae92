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

  /** STUB decoder: metadata derived deterministically from the bytes
    * (length + first byte). A real decoder parses the container format. */
  def decodeStub(m: MediaRow): MediaMeta = {
    val n = m.media.length
    val first = if (n > 0) m.media(0) & 0xff else 0
    MediaMeta(m.doc_id, m.kind, n,
      width = 320 + (n % 320),
      height = 240 + (first % 240),
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

  /** documents.text bytes as a stand-in media corpus → decoded metadata. */
  private def multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), lit("image").as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
    decodeMeta(media).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> multimodal _
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal" ->
      """SELECT doc_id, 'image' AS kind,
        | CAST(strlen(text) AS INTEGER) AS n_bytes,
        | CAST(320 + strlen(text) % 320 AS INTEGER) AS width,
        | CAST(240 + ascii(substring(text, 1, 1)) % 240 AS INTEGER) AS height,
        | strlen(text) >= 64 AS quality_ok
        |FROM documents""".stripMargin
  )
}
