package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.WavAudio

/** Pins the WAV tier the way MultimodalSpec pins the PNG tier: container
  * round-trip against the generator formula, loud failure on corrupt
  * bytes, and a by-hand replay of the windowed features. */
class WavAudioSpec extends AnyFunSuite {

  test("encode→decode round-trips the generator formula bit-for-bit") {
    val id = 42L
    val decoded = WavAudio.decodeWav(id, WavAudio.encodeWav(WavAudio.synthClip(id)))
    assert(decoded.length == WavAudio.numSamples)
    decoded.zipWithIndex.foreach { case (s, i) =>
      assert(s == WavAudio.synthSample(id, i), s"sample $i")
    }
  }

  test("header fields are the canonical 44-byte PCM16 mono layout") {
    val bytes = WavAudio.encodeWav(WavAudio.synthClip(7L))
    assert(bytes.length == 44 + WavAudio.numSamples * 2)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "data")
  }

  test("corrupt containers fail loudly, never silently") {
    val good = WavAudio.encodeWav(WavAudio.synthClip(3L))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavAudio.decodeWav(3L, badMagic))
    assertThrows[IllegalArgumentException](WavAudio.decodeWav(3L, good.take(20)))
    val badBits = good.clone(); badBits(34) = 8 // bits-per-sample 16 -> 8
    assertThrows[IllegalArgumentException](WavAudio.decodeWav(3L, badBits))
  }

  test("real-exporter containers decode: LIST chunk between fmt and data, 18-byte fmt") {
    import java.nio.{ByteBuffer, ByteOrder}
    val id = 9L
    val samples = WavAudio.synthClip(id)
    val dataLen = samples.length * 2
    // ffmpeg/Audacity-style layout: RIFF + WAVE + fmt(18, cbSize=0)
    // + LIST-INFO + data
    val bb = ByteBuffer.allocate(12 + 26 + 12 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(bb.capacity() - 8)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(18)
    bb.putShort(1).putShort(1).putInt(WavAudio.SampleRate)
      .putInt(WavAudio.SampleRate * 2).putShort(2).putShort(16)
    bb.putShort(0) // cbSize
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    val decoded = WavAudio.decodeWav(id, bb.array())
    assert(decoded.sameElements(samples))
  }

  test("trailing partial window is emitted, never silently dropped") {
    val samples = Array.tabulate(WavAudio.WindowSize * 2 + 50)(i =>
      WavAudio.synthSample(21L, i))
    val got = WavAudio.windowFeatures(21L, samples)
    assert(got.size == 3, s"450-sample clip must yield 3 windows, got ${got.size}")
    val tail = samples.drop(WavAudio.WindowSize * 2).map(_.toLong)
    assert(got(2).sum_sq == tail.map(v => v * v).sum)
    assert(got(2).n_crossings == tail.sliding(2).count(p => p(0) * p(1) < 0))
  }

  test("windowed features match a by-hand replay") {
    val id = 11L
    val samples = WavAudio.synthClip(id)
    val got = WavAudio.windowFeatures(id, samples)
    assert(got.size == WavAudio.NumWindows)
    got.foreach { ws =>
      val start = ws.win.toInt * WavAudio.WindowSize
      val window = samples.slice(start, start + WavAudio.WindowSize).map(_.toLong)
      assert(ws.sum_sq == window.map(v => v * v).sum, s"energy window ${ws.win}")
      val zc = window.sliding(2).count(p => p(0) * p(1) < 0)
      assert(ws.n_crossings == zc, s"crossings window ${ws.win}")
    }
  }

  test("energy-delta fingerprint: strict-increase bits, big-endian packing") {
    lazy val spark = SparkTestSession.spark
    import spark.implicits._
    // 150 samples at win=50 -> 3 frames, 2 bits. Clip A: quiet | loud |
    // equal-to-loud -> bits (1, 0) -> fp = 0b10 = 2 (strict compare:
    // the equal third frame does NOT set its bit). Clip B: loud |
    // quiet | quiet -> fp = 0.
    def clip(frames: Seq[Short]): Array[Short] =
      frames.flatMap(v => Array.fill(50)(v)).toArray
    val a = WavAudio.encodeWav(clip(Seq(1, 100, 100).map(_.toShort)))
    val b = WavAudio.encodeWav(clip(Seq(100, 1, 1).map(_.toShort)))
    val got = WavAudio.fingerprints(
        Seq(WavAudio.Audio(0L, a), WavAudio.Audio(1L, b)).toDS())
      .collect().map(f => f.media_id -> f.fp).toMap
    assert(got == Map(0L -> 2L, 1L -> 0L))
  }

  test("silence segmentation: maximal voiced runs by hand; boundary energy counts as voiced") {
    lazy val spark = SparkTestSession.spark
    import spark.implicits._
    // 6 frames at win=50, per-frame constant amplitude v -> energy
    // 50·v². Threshold 5000 -> voiced iff v² >= 100 (|v| >= 10; v=10
    // pins the >= boundary). Clip A: V S V V S V -> 4 voiced, 3
    // segments, longest 2. Clip B: all silent -> zeros. Clip C: all
    // voiced -> one 6-frame segment.
    def clip(frames: Seq[Short]): Array[Short] =
      frames.flatMap(v => Array.fill(50)(v)).toArray
    val a = WavAudio.encodeWav(clip(Seq(10, 1, 40, 40, 2, 12).map(_.toShort)))
    val b = WavAudio.encodeWav(clip(Seq(1, 2, 3, 1, 2, 3).map(_.toShort)))
    val c = WavAudio.encodeWav(clip(Seq(50, 50, 50, 50, 50, 50).map(_.toShort)))
    val got = WavAudio.silenceSegments(
        Seq(WavAudio.Audio(0L, a), WavAudio.Audio(1L, b), WavAudio.Audio(2L, c)).toDS(),
        threshold = 5000L)
      .collect().map(s => s.media_id -> ((s.n_frames, s.n_voiced, s.n_segments, s.longest)))
      .toMap
    assert(got(0L) == ((6L, 4L, 3L, 2L)), s"mixed clip: ${got(0L)}")
    assert(got(1L) == ((6L, 0L, 0L, 0L)), s"silent clip: ${got(1L)}")
    assert(got(2L) == ((6L, 6L, 1L, 6L)), s"voiced clip: ${got(2L)}")
  }
}
