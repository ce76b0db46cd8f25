package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Flac

/** FLAC codec: encode→decode round-trips across every subframe strategy
  * the fixture encoder rotates through (VERBATIM, FIXED 1/2, LPC,
  * CONSTANT), multi-frame streams, short last blocks, CRC rejection of
  * corruption, and the STREAMINFO MD5. Expectations are hand-derived from
  * the input waveforms, independent of the oracle path.
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Int], blockSize: Int = 256): Unit = {
    val bytes = Flac.encode(samples, 8000, blockSize)
    val Some((info, chans)) = Flac.decode(bytes)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.totalSamples == samples.length)
    assert(info.md5Ok, "decoded PCM must match the STREAMINFO MD5")
    assert(chans(0).toSeq == samples.toSeq)
  }

  test("smooth ramp round-trips (FIXED/LPC residuals compress)") {
    // linear ramp: FIXED-2 residuals are all zero — the best case
    roundTrip(Array.tabulate(1000)(i => i * 7 - 3500))
  }

  test("sine-ish curve over multiple frames, short last block") {
    // 5 full 256-blocks + a 49-sample tail; rotation covers all strategies
    val s = Array.tabulate(1329)(i => ((i * i) % 1913) - 956)
    roundTrip(s)
  }

  test("white-noise-like residuals (Rice escape path) round-trip") {
    // multiplicative-congruential chaos: FIXED predictors gain nothing, so
    // residuals are ~16-bit — exercising large Rice params / raw escape
    var x = 12345
    val s = Array.tabulate(600) { _ =>
      x = (x * 1103515245 + 12345) & 0x7fffffff
      (x % 65536) - 32768
    }
    roundTrip(s)
  }

  test("constant block emits a CONSTANT subframe and round-trips") {
    roundTrip(Array.fill(300)(-1234))
    roundTrip(Array.fill(256)(0)) // exactly one full flat block
  }

  test("extreme 16-bit values survive (sign handling at both rails)") {
    roundTrip(Array(32767, -32768, 32767, -32768, 0, 1, -1, 32767,
      -32768, 100, -100, 32766, -32767))
  }

  test("tiny inputs: empty, one, two samples") {
    roundTrip(Array.emptyIntArray)
    roundTrip(Array(42))
    roundTrip(Array(-5, 7))
  }

  test("a flipped payload bit is rejected by CRC, not decoded to garbage") {
    val samples = Array.tabulate(500)(i => (i * 13) % 2000 - 1000)
    val bytes = Flac.encode(samples, 8000)
    // flip one bit inside the first frame body (well past the 4+4+34+16
    // byte header region)
    val at = 70
    bytes(at) = (bytes(at) ^ 0x10).toByte
    assert(Flac.decode(bytes).isEmpty)
  }

  test("non-FLAC bytes yield None, never throw") {
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode("RIFFxxxxWAVE".getBytes("ASCII")).isEmpty)
    assert(Flac.decode("fLaC".getBytes("ASCII")).isEmpty)
    assert(Flac.decode(Array.fill(200)(0x55.toByte)).isEmpty)
  }

  test("fixture-waveform checksums match the closed form the oracle states") {
    // the demo table's waveform: samples = (byte-128)*256 over the text
    val text = "Hello graft"
    val samples = text.getBytes("UTF-8").map(b => ((b & 0xff) - 128) * 256)
    val Some((_, chans)) = Flac.decode(Flac.encode(samples, 8000))
    val c0 = chans(0)
    val sum = c0.map(_.toLong).sum
    val wsum = c0.zipWithIndex.map { case (s, i) => (i + 1L) * s }.sum
    // independently derived: Σ(b-128)*256 and Σ(i+1)(b-128)*256
    val bs = text.getBytes("UTF-8").map(b => (b & 0xff) - 128)
    assert(sum == bs.map(_.toLong * 256).sum)
    assert(wsum == bs.zipWithIndex.map { case (b, i) => (i + 1L) * b * 256 }.sum)
  }
}
