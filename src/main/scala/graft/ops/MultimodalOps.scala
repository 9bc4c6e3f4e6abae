package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns next to typed
  * metadata, and decode/feature-extraction runs per-partition over
  * batches of payloads.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * deterministic outputs — is real and tested. The decode itself is a
  * STUB (`FakeCodec`): the real codec libraries (JPEG/PNG/ffmpeg) are not
  * in this environment, so it derives deterministic pseudo-features from
  * the bytes. Swapping in a real codec changes only `Codec.decode`.
  *
  * At 100 TB: payloads dominate row size, so `maxPartitionBytes` (not row
  * count) sizes tasks; the mapPartitions boundary below is where a real
  * pipeline amortizes model/codec initialization per task rather than
  * per row — exactly the shape a Pandas-UDF/`mapInPandas` batch has in
  * PySpark.
  */
object MultimodalOps {

  /** Typed metadata produced by decoding one payload. */
  final case class MediaMeta(
      doc_id: Long,
      bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      durationMs: Long)

  /** The codec boundary: bytes in, typed metadata + feature vector out. */
  trait Codec extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaMeta
    def features(payload: Array[Byte], dim: Int): Array[Float]

    /** Re-encode a payload at a target resolution. */
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte]

    /** Sample one frame every `everyMs` of media time (index, bytes). */
    def sampleFrames(payload: Array[Byte], everyMs: Int): Iterator[(Int, Array[Byte])]
  }

  /** Deterministic stand-in for the real decoder (no codec libs in this
    * container). Pseudo-features are a rolling byte hash — stable across
    * runs and partitionings.
    */
  object FakeCodec extends Codec {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(id, n, (n % 640).toInt, (n * 31 % 480).toInt,
        channels = 3, durationMs = n % 3600)
    }

    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += ((h % 1000) / 1000.0f)
        i += 1
      }
      out
    }

    /** "Downsample" to at most width*height*3 bytes (prefix — a real codec
      * re-encodes; the CAP is the tested contract: output size is bounded
      * by the target resolution, not the input).
      */
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, math.min(payload.length, width * height * 3))

    /** One frame per `everyMs` of the fake duration (`bytes % 3600` ms,
      * matching [[decode]]); each frame is the first <=256 payload bytes.
      * Deterministic pure arithmetic so an SQL oracle can verify the
      * plumbing's row counts and byte totals end-to-end.
      */
    def sampleFrames(payload: Array[Byte], everyMs: Int): Iterator[(Int, Array[Byte])] = {
      val durationMs = payload.length.toLong % 3600
      val n = (durationMs / everyMs).toInt + 1
      val frame = java.util.Arrays.copyOf(payload, math.min(payload.length, 256))
      Iterator.tabulate(n)(i => (i, frame))
    }
  }

  /** Attach an opaque payload column (here derived from text — the test
    * corpus has no binary column; a real pipeline reads
    * `spark.read.format("binaryFile")` or parquet with a binary field).
    */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", encode(col(sourceCol), "UTF-8"))

  /** Batch decode: one codec instance per PARTITION (the expensive init
    * amortizes across the batch), typed Dataset out.
    */
  def decodeMeta(df: DataFrame, idCol: String, codec: Codec): Dataset[MediaMeta] = {
    val rows = df.select(col(idCol).cast("long"), col("payload"))
    rows.mapPartitions { it =>
      // per-partition codec setup happens here in a real implementation
      it.map(r => codec.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.product[MediaMeta])
  }

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Resize every payload per-partition (same codec-amortizing boundary
    * as [[decodeMeta]]); binary in, binary out.
    */
  def resizePayloads(df: DataFrame, idCol: String, codec: Codec,
                     width: Int, height: Int): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col("payload"))
    rows.mapPartitions { it =>
      it.map(r => (r.getLong(0), codec.resize(r.getAs[Array[Byte]](1), width, height)))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "payload")
  }

  /** Frame sampling: one payload row fans out to one row per sampled
    * frame — the one-to-many multimodal shape (video -> frames, audio ->
    * windows). `flatMap` inside `mapPartitions` keeps the fan-out
    * streaming (no per-doc frame list ever materializes on the heap),
    * which is what lets a long video expand to thousands of rows without
    * executor memory scaling in the video length.
    */
  def sampleFrames(df: DataFrame, idCol: String, codec: Codec,
                   everyMs: Int = 500): DataFrame = {
    // fail at plan construction, not as an ArithmeticException inside a
    // mapPartitions task after stage retries
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    val rows = df.select(col(idCol).cast("long"), col("payload"))
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        codec.sampleFrames(r.getAs[Array[Byte]](1), everyMs)
          .map { case (idx, bytes) => Frame(id, idx, bytes) }
      }
    }(Encoders.product[Frame])
      .toDF(idCol, "frame_idx", "frame")
  }

  /** (id, feature-vector) row. */
  final case class Feature(id: Long, embedding: Array[Float])

  /** Batch feature extraction -> (id, embedding) ready for SimOps. */
  def extractFeatures(df: DataFrame, idCol: String, codec: Codec,
                      dim: Int = 64): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col("payload"))
    rows.mapPartitions { it =>
      it.map(r => Feature(r.getLong(0), codec.features(r.getAs[Array[Byte]](1), dim)))
    }(Encoders.product[Feature])
      .toDF(idCol, "embedding")
  }
}
