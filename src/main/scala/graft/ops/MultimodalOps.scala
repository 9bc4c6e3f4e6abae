package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns next to typed
  * metadata, and decode/feature-extraction runs per-partition over
  * batches of payloads.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * deterministic outputs — is real and tested. IMAGES decode for real
  * via [[MultimodalOps.JdkImageCodec]] (the in-JDK `javax.imageio` +
  * `java.awt.image` stack — PNG/JPEG/GIF/BMP, no external dependency).
  * Video/audio remain an honest STUB (`FakeCodec`): their codec
  * libraries (ffmpeg et al.) are not in this environment, so it derives
  * deterministic pseudo-features from the bytes; the catalog oracles use
  * FakeCodec so results stay arithmetic-checkable. Swapping codecs
  * changes only the `Codec` instance passed at the call site.
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

  /** Real image codec on the in-JDK `javax.imageio` stack — no external
    * dependency: PNG/JPEG/GIF/BMP decode, `java.awt.image` resize,
    * re-encoded as PNG. Stills have no time axis, so `durationMs` is 0
    * and frame sampling yields exactly one frame. Video/audio stay with
    * [[FakeCodec]] (their codecs genuinely aren't in a stock JDK).
    *
    * Each method is pure bytes-in/bytes-out and allocation-local, so the
    * per-partition `mapPartitions` boundary in [[decodeMeta]] /
    * [[resizePayloads]] distributes it unchanged. A payload that does not
    * decode FAILS the task (null from `ImageIO.read`) rather than
    * fabricating metadata — corrupt training images should be filtered
    * by an explicit quality gate, not silently passed through.
    */
  object JdkImageCodec extends Codec {
    private[MultimodalOps] def readImage(
        payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val img = readImage(payload)
      MediaMeta(id, payload.length.toLong, img.getWidth, img.getHeight,
        channels = img.getColorModel.getNumComponents, durationMs = 0L)
    }

    /** Mean-pooled grayscale features: rescale to a `dim`-pixel strip and
      * emit normalized intensities — the classic cheap visual signature
      * (enough for exact-dup and layout-level near-dup detection).
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val strip = render(readImage(payload), dim, 1,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = (strip.getRaster.getSample(i, 0, 0) / 255.0f)
        i += 1
      }
      out
    }

    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val scaled = render(readImage(payload), width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", bos)
      bos.toByteArray
    }

    /** A still image is its own single frame. */
    def sampleFrames(payload: Array[Byte], everyMs: Int): Iterator[(Int, Array[Byte])] =
      Iterator.single((0, payload))

    private def render(src: java.awt.image.BufferedImage, w: Int, h: Int,
                       imageType: Int): java.awt.image.BufferedImage = {
      val dst = new java.awt.image.BufferedImage(w, h, imageType)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      dst
    }
  }

  /** Attach an opaque payload column (here derived from text — the test
    * corpus has no binary column; a real pipeline reads
    * `spark.read.format("binaryFile")` or parquet with a binary field).
    */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", encode(col(sourceCol), "UTF-8"))

  /** Deterministic REAL image payloads, generated in-engine: per id, a
    * small RGB raster whose dimensions derive from the id
    * (width = 16 + id mod 17, height = 16 + id mod 13 — coprime moduli,
    * so shapes vary) and whose pixels derive from (id, x, y), encoded as
    * PNG through the same `javax.imageio` stack [[JdkImageCodec]]
    * decodes with. This gives the real-codec path a corpus-scale,
    * oracle-checkable input without external image fixtures: an
    * arithmetic oracle knows every decoded dimension in advance, while
    * the bytes themselves are genuine PNG. Same per-partition boundary
    * as the codec ops — generation is embarrassingly parallel.
    */
  def syntheticImagePayloads(df: DataFrame, idCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"))
    rows.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        (id, synthPng(seed = id, tweak = false))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "payload")
  }

  /** Variant-aware form of [[syntheticImagePayloads]]: raster content and
    * dimensions derive from `seedCol` (not the row id), so two rows with
    * one seed are pixel-identical — the "same image, new crawl id" shape
    * near-dup detection needs planted pairs for. `tweakCol` (boolean)
    * additionally flips the top bit of pixel (0,0), a one-pixel
    * perturbation that moves a difference hash by at most one bit — the
    * "slightly re-encoded copy" shape.
    */
  def syntheticImagePayloads(df: DataFrame, idCol: String, seedCol: String,
                             tweakCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col(seedCol).cast("long"),
      col(tweakCol).cast("boolean"))
    rows.mapPartitions { it =>
      it.map(r => (r.getLong(0), synthPng(r.getLong(1), r.getBoolean(2))))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "payload")
  }

  /** One deterministic PNG: width/height/pixels are pure functions of
    * `seed` (see [[syntheticImagePayloads]]), byte-stable across JVMs
    * (PNG is lossless and the raster is computed, not sampled).
    */
  private def synthPng(seed: Long, tweak: Boolean): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(seed, 17L).toInt
    val h = 16 + java.lang.Math.floorMod(seed, 13L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13, 256L).toInt
        val v = if (tweak && x == 0 && y == 0) base ^ 128 else base
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((v * 3) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  // --- perceptual hashing / image near-dup ------------------------------

  private def grayOf(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** 56-bit difference hash (dHash) of a decoded image: sample an 8x8
    * grid of gray values, set bit `y*7+x` iff gray(x,y) > gray(x+1,y).
    * Two deliberate deviations from the folklore 9x8 recipe, both for
    * checkability at no detection cost: (1) the grid is sampled with
    * integer nearest-neighbor (`sx = x*w/8`) on the FULL decoded raster
    * instead of an interpolating rescale — `java.awt` bilinear output is
    * implementation-defined, while integer sampling lets an arithmetic
    * oracle reproduce every bit; (2) 8 columns -> 7 comparisons = 56
    * bits, keeping the hash (and every band shift below) inside a
    * signed 64-bit long on BOTH engines (bit 63 of an 8x9 hash would
    * overflow a SQL BIGINT sum).
    */
  def dHash56(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      var g0 = grayOf(img.getRGB(0, sy))
      while (x < 7) {
        val g1 = grayOf(img.getRGB((x + 1) * w / 8, sy))
        if (g0 > g1) hash |= 1L << (y * 7 + x)
        g0 = g1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-image dHash through the REAL `javax.imageio` decode, same
    * per-partition codec boundary as [[decodeMeta]]. Output:
    * (idCol, dhash long).
    */
  def dHashes(df: DataFrame, idCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long"), col("payload"))
    rows.mapPartitions { it =>
      it.map(r => (r.getLong(0),
        dHash56(JdkImageCodec.readImage(r.getAs[Array[Byte]](1)))))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "dhash")
  }

  /** Image near-dup pairs within `maxHamming` over [[dHash56]] hashes,
    * by banded pigeonhole join: the 56-bit hash splits into 4 bands of
    * 14 bits, any pair within hamming distance 3 (< number of bands)
    * must agree EXACTLY on at least one band, so candidates come from a
    * band-key equi-join — shuffle keys are (band#, 14-bit value), never
    * an all-pairs product — then exact hamming verifies. The same
    * LSH-shape as the MinHash/SimHash text paths: at 100 TB the
    * candidate volume is bounded by band-bucket collisions, not n².
    * Output: (a_id, b_id, hamming), a_id > b_id.
    */
  def dhashNearDupPairs(hashes: DataFrame, idCol: String,
                        hashCol: String = "dhash",
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"4 bands of 14 bits guarantee recall only for hamming <= 3, got $maxHamming")
    val banded = hashes.select(col(idCol), col(hashCol), explode(array(
      (0 until 4).map(b => struct(lit(b).as("bno"),
        shiftright(col(hashCol), b * 14).bitwiseAND(lit(0x3fffL)).as("bkey"))): _*)).as("bs"))
      .select(col(idCol), col(hashCol), col("bs.bno"), col("bs.bkey"))
    // a pair sharing k bands appears k times; distinct on the id pair
    // before the (cheap) hamming compute
    banded.as("a").join(banded.as("b"),
        col("a.bno") === col("b.bno") && col("a.bkey") === col("b.bkey") &&
          col(s"a.$idCol") > col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        col(s"a.$hashCol").as("__ah"), col(s"b.$hashCol").as("__bh"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        TextOps.hamming(col("__ah"), col("__bh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
