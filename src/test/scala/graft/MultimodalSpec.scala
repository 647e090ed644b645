package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.MediaIn

/** Unit tests for the pure-JVM media decoders — the branches the oracle
  * gate can't reach from the fixture corpus (negative PCM samples, extra
  * RIFF chunks, surgical truncations). */
class MultimodalSpec extends SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  test("wav: negative 16-bit samples sign-extend and fold exactly") {
    // samples: -1, -32768, 32767, 0
    val data = le16(0xffff) ++ le16(0x8000) ++ le16(0x7fff) ++ le16(0)
    val payload = wavWithData(data, rate = 8000)
    val f = Multimodal.decodeWav(MediaIn(7L, payload))
    assert(f.fmt_ok)
    assert(f.n_samples.contains(4L))
    assert(f.sum_samples.contains(-1L - 32768L + 32767L + 0L))
    assert(f.peak_abs.contains(32768))
    assert(f.sum_sq.contains(1L + 32768L * 32768L + 32767L * 32767L))
  }

  test("wav: the chunk walk skips unknown chunks before fmt/data") {
    val data = le16(5) ++ le16(6)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val payload = spliceChunk(wavWithData(data, rate = 12000), junk)
    val f = Multimodal.decodeWav(MediaIn(1L, payload))
    assert(f.fmt_ok && f.sample_rate.contains(12000) &&
      f.sum_samples.contains(11L))
  }

  test("wav rejects: bad magic, truncated data, odd data size, non-PCM") {
    val data = le16(1) ++ le16(2)
    val good = wavWithData(data, rate = 8000)
    val badMagic = good.clone(); badMagic(3) = 'X'.toByte
    assert(!Multimodal.decodeWav(MediaIn(1L, badMagic)).fmt_ok)
    // truncated: cut the last byte (container size field now disagrees)
    assert(!Multimodal.decodeWav(MediaIn(1L, good.dropRight(1))).fmt_ok)
    // odd declared data size
    val odd = good.clone(); odd(40) = 3 // data chunk size 4 -> 3
    assert(!Multimodal.decodeWav(MediaIn(1L, odd)).fmt_ok)
    // audioFormat != 1 (non-PCM)
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(!Multimodal.decodeWav(MediaIn(1L, nonPcm)).fmt_ok)
  }

  test("wavBytes round-trips through decodeWav (ASCII and empty text)") {
    val f = Multimodal.decodeWav(MediaIn(3L,
      Multimodal.wavBytes(3L, "abcd".getBytes("UTF-8"), corrupt = false)))
    // 'a'=97,'b'=98 -> 97 + 256*98 = 25185; 'c','d' -> 99 + 256*100 = 25699
    assert(f.fmt_ok && f.n_samples.contains(2L) &&
      f.sum_samples.contains(25185L + 25699L) &&
      f.sample_rate.contains(8000)) // 8000 + (3 % 3) * 4000
    val e = Multimodal.decodeWav(MediaIn(1L,
      Multimodal.wavBytes(1L, Array.emptyByteArray, corrupt = false)))
    assert(e.fmt_ok && e.n_samples.contains(0L) && e.peak_abs.contains(0))
    assert(!Multimodal.decodeWav(MediaIn(1L,
      Multimodal.wavBytes(1L, "abcd".getBytes("UTF-8"), corrupt = true))).fmt_ok)
  }

  /** Canonical 44-byte header + data, via the production synthesizer then
    * patched to the wanted rate (wavBytes derives rate from doc_id). */
  private def wavWithData(data: Array[Byte], rate: Int): Array[Byte] = {
    val base = Multimodal.wavBytes(0L, data, corrupt = false)
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(24, rate).putInt(28, rate * 2)
    base
  }

  /** Insert a raw chunk right after the fmt chunk (offset 36). */
  private def spliceChunk(wav: Array[Byte], chunk: Array[Byte]): Array[Byte] = {
    val out = wav.take(36) ++ chunk ++ wav.drop(36)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, out.length - 8)
    out
  }
}
