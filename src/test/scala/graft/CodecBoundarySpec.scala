package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Flac, Mp3}

/** Honesty-boundary gate (round 11): the MP3/FLAC codecs document that
  * container and frame-header parsing is REAL while the compressed
  * audio payloads (MP3 Huffman spectra, FLAC Rice-coded LPC frames)
  * are the library-bound step left out of scope. This spec pins that
  * boundary mechanically, in both directions:
  *
  *  - metadata is exact byte accounting derived from HEADERS alone,
  *    and is bit-insensitive to payload bytes — two streams differing
  *    only in payload content must decode to identical metadata;
  *  - headers are genuinely parsed — corrupting one mid-stream header
  *    byte must fail the walk, not be skipped over.
  *
  * If a future change starts decoding payloads (or accidentally
  * depends on payload bytes), these assertions fire and force a
  * deliberate update of the documented boundary. Byte-level only — no
  * SparkSession needed.
  */
class CodecBoundarySpec extends AnyFunSuite {

  private val mp3Frames = Seq.tabulate(12)(i => ((1 + i % 14), i % 2))

  test("mp3 walk is exact header-derived byte accounting") {
    val bytes = Mp3.encode(srIdx = 1, mono = false, frames = mp3Frames,
      id3Payload = Some(77), fill = (i, j) => (i * 31 + j) % 251)
    val m = Mp3.decode(9L, bytes)
    assert(m.has_id3 && m.id3_size == 77L)
    assert(m.n_frames == 12L)
    assert(m.sample_rate == 48000L && m.channels == 2L)
    // every byte is accounted for: ID3 (10 + payload) + sum of frame
    // lengths computed from the published tables — nothing estimated
    assert(m.total_bytes == bytes.length - (10 + 77))
    assert(m.total_bytes ==
      mp3Frames.map { case (br, pad) => Mp3.frameLen(br, 1, pad) }.sum)
    assert(m.duration_ms == 12L * 1152L * 1000L / 48000L)
    assert(m.sum_bitrate_kbps ==
      mp3Frames.map { case (br, _) => Mp3.BitrateKbps(br) }.sum)
  }

  test("mp3 metadata is bit-insensitive to payload bytes (no spectral decode)") {
    val a = Mp3.encode(1, mono = true, mp3Frames, None, (i, j) => (i + j) % 251)
    val b = Mp3.encode(1, mono = true, mp3Frames, None, (i, j) => (i * 3 + j * 7 + 5) % 251)
    assert(!java.util.Arrays.equals(a, b), "payloads must actually differ")
    assert(Mp3.decode(1L, a) == Mp3.decode(1L, b),
      "metadata depended on payload bytes — the documented library-bound " +
        "boundary (no Huffman spectral decode) has been crossed; update " +
        "the codec scaladoc and this spec deliberately if that is intended")
  }

  test("mp3 headers are genuinely walked: corrupting a mid-stream sync byte fails") {
    val bytes = Mp3.encode(2, mono = false, mp3Frames, None, (_, _) => 0)
    // frame 0 starts at 0; frame 1 starts after frameLen(frame 0)
    val f1 = Mp3.frameLen(mp3Frames.head._1, 2, mp3Frames.head._2)
    bytes(f1) = 0x00 // kill the second frame's sync
    intercept[IllegalArgumentException](Mp3.decode(2L, bytes))
  }

  test("flac metadata is bit-insensitive to frame payload bytes (no Rice decode)") {
    val md5 = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    val a = Flac.encode(44100, 2, 16, 88200L, md5, withComment = true,
      withPadding = true, frameBytes = Array.fill[Byte](300)(0x11))
    val b = Flac.encode(44100, 2, 16, 88200L, md5, withComment = true,
      withPadding = true, frameBytes = Array.tabulate[Byte](300)(i => (i % 97).toByte))
    assert(!java.util.Arrays.equals(a, b), "payloads must actually differ")
    val ma = Flac.decode(3L, a)
    val mb = Flac.decode(3L, b)
    assert(ma == mb,
      "metadata depended on FLAC frame bytes — the documented " +
        "library-bound boundary (no Rice-coded LPC decode) has been " +
        "crossed; update the codec scaladoc and this spec deliberately")
    // and the STREAMINFO fields are the bit-packed truth, incl. the
    // audio md5 copied from the header (NOT recomputed from samples)
    assert(ma.sample_rate == 44100L && ma.channels == 2L &&
      ma.bits_per_sample == 16L && ma.total_samples == 88200L)
    assert(ma.duration_ms == 88200L * 1000L / 44100L)
    assert(ma.audio_md5 == md5.map("%02x".format(_)).mkString)
  }

  test("flac headers are genuinely parsed: corrupting the magic fails") {
    val bytes = Flac.encode(8000, 1, 16, 100L, new Array[Byte](16),
      withComment = false, withPadding = false, frameBytes = Array[Byte](1, 2, 3))
    bytes(0) = 'X'
    intercept[IllegalArgumentException](Flac.decode(4L, bytes))
  }
}
