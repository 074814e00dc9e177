package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((0L, "x" * 100), (1L, "y" * 700), (2L, "z" * 10))
      .toDF("doc_id", "text"))

  test("payload is a valid BMP container and corrupt magic fails loudly") {
    import java.nio.{ByteBuffer, ByteOrder}
    val p = media.where(col("media_id") === 0L)
      .select("payload").as[Array[Byte]].head()
    assert(p(0) == 'B'.toByte && p(1) == 'M'.toByte)
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(2) == p.length)            // file size field
    assert(bb.getInt(10) == Multimodal.HeaderBytes) // data offset
    assert(bb.getInt(34) == 100)                // image data size == data len
    val bad = p.clone(); bad(0) = 'X'.toByte
    val badDf = Seq((99L, "image", bad)).toDF("media_id", "kind", "payload")
    val e = intercept[Exception] { Multimodal.decode(badDf).collect() }
    assert(e.getMessage != null)
  }

  test("decode parses dimensions back out of the BMP header; kind cycles") {
    val d = Multimodal.decode(media).collect().map(r => r.media_id -> r).toMap
    assert(d(0L).kind == "image" && d(1L).kind == "audio" && d(2L).kind == "video")
    assert(d(0L).width == 64 + 100 % 192 && d(0L).height == 64 + (100 / 7) % 192)
    assert(d(0L).channels == 3 && d(1L).channels == 1)
  }

  test("PixelImage: PNG encode→ImageIO decode round-trips the generator pixels exactly") {
    import graft.multimodal.PixelImage
    val id = 7L
    val img = PixelImage.decodePng(id, PixelImage.encodePng(PixelImage.synthImage(id)))
    val (w, h) = PixelImage.dimsOf(id)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == PixelImage.synthPixel(id, x, y, 0))
      assert(((p >> 8) & 0xff) == PixelImage.synthPixel(id, x, y, 1))
      assert((p & 0xff) == PixelImage.synthPixel(id, x, y, 2))
    }
  }

  test("PixelImage: 2-D NN resize reads source (x*sw/tw, y*sh/th) per pixel") {
    import graft.multimodal.PixelImage
    val src = PixelImage.synthImage(3L) // 19 x 13
    val out = PixelImage.resizeNN(src, 5, 4)
    assert(out.getWidth == 5 && out.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(out.getRGB(x, y) ==
        src.getRGB(x * src.getWidth / 5, y * src.getHeight / 4),
        s"wrong NN source for target ($x,$y)")
    // downscale-to-1 degenerate case: the single pixel is source (0, 0)
    val one = PixelImage.resizeNN(src, 1, 1)
    assert(one.getRGB(0, 0) == src.getRGB(0, 0))
  }

  test("PixelImage: corrupt payload fails loudly, never silently") {
    import graft.multimodal.PixelImage
    val e = intercept[Exception] {
      PixelImage.decodePng(99L, Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("99"))
  }

  test("PixelImage: channelStats over the resize stage matches a by-hand replay") {
    import graft.multimodal.PixelImage
    val docs = Seq(0L, 1L, 5L).toDF("doc_id")
    val got = PixelImage.channelStats(
        PixelImage.resize(PixelImage.mediaFromDocuments(docs), 16, 12))
      .collect().map(s => s.media_id -> s).toMap
    for (id <- Seq(0L, 1L, 5L)) {
      val (w, h) = PixelImage.dimsOf(id)
      var r = 0L; var g = 0L; var b = 0L
      for (y <- 0 until 12; x <- 0 until 16) {
        val sx = x * w / 16; val sy = y * h / 12
        r += PixelImage.synthPixel(id, sx, sy, 0)
        g += PixelImage.synthPixel(id, sx, sy, 1)
        b += PixelImage.synthPixel(id, sx, sy, 2)
      }
      val s = got(id)
      assert((s.width, s.height, s.r_sum, s.g_sum, s.b_sum) == (16, 12, r, g, b))
    }
  }

  test("PixelImage kernels are stream-safe: decode+stats on a MemoryStream agree with batch") {
    import graft.multimodal.PixelImage
    import graft.multimodal.PixelImage.Media
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // the stats stage is a stateless typed mapPartitions — no state
    // store, no watermark, append-safe: the same kernel IS the
    // streaming twin. Prove it across micro-batch boundaries.
    val mem = MemoryStream[Media]
    val q = PixelImage.channelStats(mem.toDS())
      .writeStream.format("memory").queryName("px_stats")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Media(2L, PixelImage.encodePng(PixelImage.synthImage(2L))))
      q.processAllAvailable()
      mem.addData(Media(9L, PixelImage.encodePng(PixelImage.synthImage(9L))))
      q.processAllAvailable()
      val streamed = spark.table("px_stats").as[(Long, Int, Int, Long, Long, Long)]
        .collect().map(r => r._1 -> r).toMap
      val batch = PixelImage.channelStats(
          PixelImage.mediaFromDocuments(Seq(2L, 9L).toDF("doc_id")))
        .collect().map(s =>
          s.media_id -> ((s.media_id, s.width, s.height, s.r_sum, s.g_sum, s.b_sum))).toMap
      assert(streamed == batch, "a payload must get identical stats on stream and backfill")
    } finally q.stop()
  }

  test("frame sampling counts: ceil split, every 4th kept") {
    val fs = Multimodal.frameSample(media, frameBytes = 256, stride = 4)
      .select("media_id", "n_frames", "n_sampled")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fs(0L) == (1L, 1L))  // 100 bytes -> 1 frame, offset 0 sampled
    assert(fs(1L) == (3L, 1L))  // 700 -> 3 frames, offsets {0}
    assert(fs(2L) == (1L, 1L))
  }

  test("null / empty text: header-only payload, zero frames (no [0,-1] sequence)") {
    val edge = Multimodal.mediaFromDocuments(
      Seq((0L, null.asInstanceOf[String]), (1L, "")).toDF("doc_id", "text"))
    // both wrap to a bare 54-byte header; decode still parses it
    val d = Multimodal.decode(edge).collect().map(r => r.media_id -> r).toMap
    assert(d(0L).width == 64 && d(1L).width == 64)
    val fs = Multimodal.frameSample(edge, frameBytes = 256, stride = 4)
      .select("media_id", "n_frames", "n_sampled")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fs(0L) == (0L, 0L), "empty payload must sample zero frames")
    assert(fs(1L) == (0L, 0L))
  }

  test("PixelImage.aHash: uniform image hashes to zero; half-split sets exactly the bright half") {
    import java.awt.image.BufferedImage
    import graft.multimodal.PixelImage
    // uniform gray: no cell is STRICTLY above the mean -> all bits 0
    val flat = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) flat.setRGB(x, y, 0xff808080)
    // left half black, right half white: exactly the 32 right-column
    // cells (x >= 4 after 8x8 NN resample) exceed the mean
    val split = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16)
      split.setRGB(x, y, if (x < 8) 0xff000000 else 0xffffffff)
    val media = Seq(
      PixelImage.Media(0L, PixelImage.encodePng(flat)),
      PixelImage.Media(1L, PixelImage.encodePng(split))).toDS()
    val got = PixelImage.aHash(media).collect().map(h => h.media_id -> h).toMap
    assert(got(0L).phash_hi == 0L && got(0L).phash_lo == 0L)
    // per 8-cell row the bright bits are positions 4..7: 0x0f0f0f0f in
    // each packed 32-bit half (bit 31-p ordering)
    assert(got(1L).phash_hi == 0x0f0f0f0fL && got(1L).phash_lo == 0x0f0f0f0fL,
      s"got ${got(1L)}")
  }

  test("mm_image_near_dup banding is COMPLETE: census equals the brute-force all-pairs census") {
    // the pigeonhole claim (Hamming <= 3 pairs always share a 16-bit
    // band) checked against an exhaustive quadratic scan of the real
    // sf0.001 signature set — if banding dropped any qualifying pair,
    // some census row would come up short
    import graft.multimodal.PixelImage
    val sigs = PixelImage.aHash(PixelImage.mediaFromDocuments(
        Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect().map(h => (h.phash_hi, h.phash_lo)).distinct
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._1 ^ sigs(j)._1) +
        java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if d <= 3
    } yield d.toLong).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val banded = SparkEntry.queries("mm_image_near_dup")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toMap
    SparkEntry.releaseCaches()
    assert(banded == brute, s"banded census $banded vs brute force $brute")
  }
}
