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

  test("resize rewrites the header to target dims and NN-subsamples the data") {
    val rs = Multimodal.resize(media.toDF(), targetW = 64, targetH = 64)
    val byId = rs.collect().map(r => r.media_id -> r.payload).toMap
    // decode must read back the TARGET dims from the rewritten header
    val dec = Multimodal.decode(rs.toDF()).collect().map(r => r.media_id -> r).toMap
    assert(dec.values.forall(d => d.width == 64 && d.height == 64))
    assert(dec(0L).channels == 3 && dec(1L).channels == 1) // channels survive
    // size bookkeeping: m = min(n, n*4096/(w*h)) with the encode formulas
    for ((id, n) <- Seq(0L -> 100L, 1L -> 700L, 2L -> 10L)) {
      val w = 64 + n % 192; val h = 64 + (n / 7) % 192
      val m = math.min(n, n * 4096 / (w * h))
      assert(byId(id).length == Multimodal.HeaderBytes + m,
        s"media $id: expected $m data bytes")
    }
    // the bytes really are the NN subsample of the source data section
    val src = media.where(col("media_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    val out = byId(1L)
    val n = src.length - Multimodal.HeaderBytes
    val m = out.length - Multimodal.HeaderBytes
    (0 until m).foreach { j =>
      assert(out(Multimodal.HeaderBytes + j) ==
        src(Multimodal.HeaderBytes + (j.toLong * n / m).toInt))
    }
  }

  test("feature kernel is deterministic and shape-stable") {
    val f1 = Multimodal.features(media, dim = 8).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.features(media, dim = 8).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 8))
    assert(f1(0L) != f1(1L), "different payloads -> different features")
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
}
