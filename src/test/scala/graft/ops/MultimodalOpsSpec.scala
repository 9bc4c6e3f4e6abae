package graft.ops

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: binary payload column, per-partition batch
  * decode, deterministic features feeding the similarity ops.
  */
class MultimodalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("payload column is binary; metadata decode is typed and total") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val withBlob = MultimodalOps.withPayload(docs, "text")
    assert(withBlob.schema("payload").dataType
      == org.apache.spark.sql.types.BinaryType)
    val meta = MultimodalOps.decodeMeta(withBlob, "doc_id", MultimodalOps.FakeCodec)
    val rows = meta.collect()
    assert(rows.length == 50)
    assert(rows.forall(m => m.bytes > 0 && m.width < 640 && m.height < 480))
  }

  test("feature extraction is deterministic and partition-invariant") {
    val docs = Tables.load(spark, sf, "documents").limit(40)
    val blob = MultimodalOps.withPayload(docs, "text")
    def run(parts: Int): Map[Long, Seq[Float]] =
      MultimodalOps.extractFeatures(blob.repartition(parts), "doc_id",
          MultimodalOps.FakeCodec, dim = 16)
        .as[(Long, Seq[Float])].collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a == b) // same features regardless of partitioning
    assert(a.values.forall(_.length == 16))
  }

  test("extracted features flow into similarity search") {
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.withPayload(docs, "text"), "doc_id", MultimodalOps.FakeCodec)
    val top = SimOps.bruteForceTopK(
      feats.filter($"doc_id" === 0), feats, "doc_id", "embedding", 3)
    assert(top.count() == 3)
  }

  test("resize caps payload size at the target resolution") {
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val blob = MultimodalOps.withPayload(docs, "text")
    val small = MultimodalOps.resizePayloads(blob, "doc_id",
        MultimodalOps.FakeCodec, width = 4, height = 4)
      .as[(Long, Array[Byte])].collect()
    assert(small.length == 30)
    assert(small.forall(_._2.length <= 4 * 4 * 3))
    // resolution-preserving resize keeps short payloads intact
    val orig = blob.select($"doc_id", $"payload")
      .as[(Long, Array[Byte])].collect().toMap
    val big = MultimodalOps.resizePayloads(blob, "doc_id",
        MultimodalOps.FakeCodec, width = 640, height = 480)
      .as[(Long, Array[Byte])].collect()
    assert(big.forall { case (id, p) => p.sameElements(orig(id)) })
  }

  test("JdkImageCodec decodes real PNGs end-to-end through the pipeline ops") {
    // real image fixtures, generated in-test: solid-color PNGs at
    // distinct resolutions — no external files, real ImageIO bytes
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val imgs = Seq((1L, png(6, 4, 0xff0000)), (2L, png(10, 2, 0x00ff00)),
        (3L, png(3, 3, 0x0000ff)))
      .toDF("doc_id", "payload").repartition(2)
    val codec = MultimodalOps.JdkImageCodec

    val meta = MultimodalOps.decodeMeta(imgs, "doc_id", codec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 6 && meta(1L).height == 4)
    assert(meta(2L).width == 10 && meta(2L).height == 2)
    assert(meta.values.forall(_.channels == 3))
    assert(meta.values.forall(_.durationMs == 0L)) // stills have no time axis

    // resize re-encodes at the target resolution — decode the OUTPUT to
    // prove it is itself a valid image of the requested size
    val resized = MultimodalOps.resizePayloads(imgs, "doc_id", codec, 4, 4)
    val rmeta = MultimodalOps.decodeMeta(resized, "doc_id", codec).collect()
    assert(rmeta.length == 3)
    assert(rmeta.forall(m => m.width == 4 && m.height == 4))

    // features: normalized grayscale strip — solid red/green/blue images
    // produce constant, distinct intensities
    val feats = MultimodalOps.extractFeatures(imgs, "doc_id", codec, dim = 8)
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats.values.forall(v => v.length == 8 &&
      v.forall(f => f >= 0f && f <= 1f)))
    assert(feats(1L).distinct.size == 1, "solid image must pool to one value")
    assert(feats(1L).head != feats(2L).head || feats(1L).head != feats(3L).head)

    // a still is its own single frame
    val frames = MultimodalOps.sampleFrames(imgs, "doc_id", codec)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.length == 3 && frames.forall(_._2 == 0))

    // corrupt payloads fail loudly instead of fabricating metadata
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeMeta(bad, "doc_id", codec).collect()
    }
  }

  test("syntheticImagePayloads emit real PNGs with id-derived dimensions") {
    // negative id included: dimension arithmetic must floorMod, not
    // produce a negative size and crash the raster allocation
    val ids = Seq(0L, 1L, 16L, 17L, -5L).toDF("doc_id")
    val payloads = MultimodalOps.syntheticImagePayloads(ids, "doc_id")
    val meta = MultimodalOps.decodeMeta(payloads, "doc_id",
        MultimodalOps.JdkImageCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta.size == 5)
    def fm(id: Long, m: Long) = java.lang.Math.floorMod(id, m).toInt
    meta.foreach { case (id, m) =>
      assert(m.width == 16 + fm(id, 17) && m.height == 16 + fm(id, 13),
        s"id $id decoded ${m.width}x${m.height}")
      assert(m.channels == 3 && m.durationMs == 0L)
    }
    // generation is deterministic across runs/partitionings: same ids ->
    // byte-identical payloads
    val again = MultimodalOps.syntheticImagePayloads(ids.repartition(3), "doc_id")
      .as[(Long, Array[Byte])].collect().toMap
    val first = payloads.as[(Long, Array[Byte])].collect().toMap
    assert(again.keySet == first.keySet)
    assert(again.forall { case (id, p) => p.sameElements(first(id)) })
  }

  test("dHash56: identical rasters collide, the one-pixel tweak moves <=1 bit") {
    val base = Seq((1L, 42L, false), (2L, 42L, false), (3L, 42L, true),
      (4L, 99L, false)).toDF("id", "seed", "tweak")
    val hs = MultimodalOps.dHashes(
        MultimodalOps.syntheticImagePayloads(base, "id", "seed", "tweak"), "id")
      .as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L))                                // same seed = same image
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) <= 1)   // perturbed pixel
    assert(hs.values.forall(v => v >= 0L && v < (1L << 56))) // 56-bit contract
    val pairs = MultimodalOps.dhashNearDupPairs(
        MultimodalOps.dHashes(
          MultimodalOps.syntheticImagePayloads(base, "id", "seed", "tweak"), "id"),
        "id")
      .as[(Long, Long, Int)].collect().toSet
    // banded join must surface every same-seed pair; the tweak moves the
    // hash by AT MOST one bit (it may move zero — the gray delta need
    // not flip the one comparison that samples the pixel)
    val sameSeedIds = Set((2L, 1L), (3L, 1L), (3L, 2L))
    assert(sameSeedIds.subsetOf(pairs.map(p => (p._1, p._2))),
      s"missed planted pairs: $pairs")
    assert(pairs.forall(p => p._3 <= 3))
  }

  test("dhashNearDupPairs band recall equals exhaustive search at hamming<=3") {
    val rows = (0L until 60L).map(i => (i, i % 20, false)).toDF("id", "seed", "tweak")
    val hs = MultimodalOps.dHashes(
      MultimodalOps.syntheticImagePayloads(rows, "id", "seed", "tweak"), "id")
    val got = MultimodalOps.dhashNearDupPairs(hs, "id")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val all = hs.as[(Long, Long)].collect()
    val want = (for {
      a <- all; b <- all if a._1 > b._1
      if java.lang.Long.bitCount(a._2 ^ b._2) <= 3
    } yield (a._1, b._1)).toSet
    assert(got == want, s"banded != exhaustive: missing ${want -- got}, extra ${got -- want}")
  }

  test("frame sampling fans out one row per frame, partition-invariant") {
    val docs = Tables.load(spark, sf, "documents").limit(25)
    val blob = MultimodalOps.withPayload(docs, "text")
    def run(parts: Int): Map[(Long, Int), Int] =
      MultimodalOps.sampleFrames(blob.repartition(parts), "doc_id",
          MultimodalOps.FakeCodec, everyMs = 500)
        .as[(Long, Int, Array[Byte])].collect()
        .map(r => (r._1, r._2) -> r._3.length).toMap
    val a = run(1)
    assert(a == run(5))
    val sizes = docs.select($"doc_id",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.encode($"text", "UTF-8")).cast("long"))
      .as[(Long, Long)].collect().toMap
    sizes.foreach { case (id, n) =>
      val expectFrames = ((n % 3600) / 500 + 1).toInt
      val got = a.keys.count(_._1 == id)
      assert(got == expectFrames, s"doc $id: $got frames, expected $expectFrames")
      assert(a.filter(_._1._1 == id).values.forall(_ == math.min(n, 256).toInt))
    }
  }
}
