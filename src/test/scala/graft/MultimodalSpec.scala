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
  test("wav: oversized u32 chunk size rejects instead of walking backwards") {
    // declared chunk size 0xFFFFFFF8 truncates to -8 as an Int — the old
    // walk would step 0 (or negative) and loop; the guard must reject
    val base = Multimodal.wavBytes(0L, "abcdef".getBytes("US-ASCII"), corrupt = false)
    val evil = spliceChunk(base,
      "JUNK".getBytes("US-ASCII") ++ Array(0xf8, 0xff, 0xff, 0xff).map(_.toByte))
    assert(!Multimodal.decodeWav(MediaIn(0L, evil)).fmt_ok)
  }

  test("png: all five filters reconstruct; corrupt chunk CRC rejects") {
    val raster = Array.tabulate(16 * 5 * 3)(i => ((i * 7 + 3) % 256).toByte)
    val ok = Multimodal.decodePng(MediaIn(1L,
      Multimodal.pngBytes(raster, 16, 5, corrupt = false)))
    assert(ok.fmt_ok && ok.width.contains(16) && ok.height.contains(5))
    val (er, eg, eb) = (0 until raster.length by 3).foldLeft((0L, 0L, 0L)) {
      case ((r, g, b), j) =>
        (r + (raster(j) & 0xff), g + (raster(j + 1) & 0xff), b + (raster(j + 2) & 0xff))
    }
    assert(ok.sum_r.contains(er) && ok.sum_g.contains(eg) && ok.sum_b.contains(eb),
      "unfiltered raster must be byte-identical to the encoder input")
    assert(!Multimodal.decodePng(MediaIn(1L,
      Multimodal.pngBytes(raster, 16, 5, corrupt = true))).fmt_ok,
      "a flipped IHDR CRC byte must reject")
  }

  test("png rejects: bad signature, truncated IDAT, wrong inflated length") {
    val raster = Array.tabulate(9 * 2 * 3)(i => (i % 251).toByte)
    val good = Multimodal.pngBytes(raster, 9, 2, corrupt = false)
    val badSig = good.clone(); badSig(0) = 0x00
    assert(!Multimodal.decodePng(MediaIn(2L, badSig)).fmt_ok)
    assert(!Multimodal.decodePng(MediaIn(2L, good.take(good.length - 20))).fmt_ok,
      "a truncated chunk stream must reject")
    // a 0x0 image is structurally valid and folds to zero sums
    val empty = Multimodal.decodePng(MediaIn(3L,
      Multimodal.pngBytes(Array.emptyByteArray, 0, 0, corrupt = false)))
    assert(empty.fmt_ok && empty.n_px.contains(0L) && empty.sum_r.contains(0L))
  }

  test("resize: nearest-neighbor 8x8 sample sums match hand-computed indices") {
    // 16x5 RGB raster with distinct per-byte values
    val (w, h) = (16, 5)
    val raster = Array.tabulate(w * h * 3)(i => ((i * 11 + 5) % 256).toByte)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val ok = Multimodal.decodeResizePpm(MediaIn(1L, header ++ raster))
    assert(ok.fmt_ok && ok.out_w.contains(8) && ok.out_h.contains(8))
    var (er, eg, eb) = (0L, 0L, 0L)
    for (r <- 0 until 8; c <- 0 until 8) {
      val p = 3 * ((r * h / 8) * w + (c * w / 8))
      er += raster(p) & 0xff; eg += raster(p + 1) & 0xff; eb += raster(p + 2) & 0xff
    }
    assert(ok.sum_r.contains(er) && ok.sum_g.contains(eg) && ok.sum_b.contains(eb),
      "sampled sums must come from exactly the r*h/8, c*w/8 source pixels")
    // upsampling repeats pixels: a 2x1 raster sampled to 8x8 is 32 of each
    val tiny = Array[Byte](10, 20, 30, 40, 50, 60)
    val up = Multimodal.decodeResizePpm(MediaIn(2L,
      "P6\n2 1\n255\n".getBytes("US-ASCII") ++ tiny))
    assert(up.sum_r.contains(32L * 10 + 32L * 40))
    // empty raster -> 0x0, zero sums; corrupt magic -> dead-letter
    val empty = Multimodal.decodeResizePpm(MediaIn(3L,
      "P6\n0 0\n255\n".getBytes("US-ASCII")))
    assert(empty.fmt_ok && empty.out_w.contains(0) && empty.sum_r.contains(0L))
    assert(!Multimodal.decodeResizePpm(MediaIn(4L,
      "XX\n2 1\n255\n".getBytes("US-ASCII") ++ tiny)).fmt_ok)
  }

  test("png: a CRC-valid IHDR with overflowing width rejects, never crashes") {
    import java.util.zip.CRC32
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      bo.write(be32(data.length.toLong), 0, 4)
      bo.write(typ.getBytes("US-ASCII"), 0, 4)
      bo.write(data, 0, data.length)
      val crc = new CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bo.write(be32(crc.getValue), 0, 4)
    }
    // w = 0x2AAAAAAB passes the w >= 0 check but w*3 wraps negative in
    // Int — the stride guard must dead-letter instead of letting the
    // negative array allocation escape the DataFormatException catch
    val ihdr = be32(0x2AAAAAABL) ++ be32(1L) ++ Array[Byte](8, 2, 0, 0, 0)
    chunk("IHDR", ihdr)
    chunk("IEND", Array.emptyByteArray)
    val out = Multimodal.decodePng(MediaIn(7L, bo.toByteArray))
    assert(!out.fmt_ok, "overflowing stride must reject, not throw")
  }

  test("gzip: real member round-trips; both corruption arms reject") {
    val text = "the quick brown fox jumps over the lazy dog"
    val tb = text.getBytes("UTF-8")
    val ok = Multimodal.decodeGzip(MediaIn(1L,
      Multimodal.gzipBytes(tb, corruptHdr = false, corruptTrailer = false)))
    assert(ok.ok && ok.n_bytes.contains(tb.length.toLong))
    assert(ok.ws_tokens.contains(9L), "8 spaces -> 9 single-space tokens")
    assert(ok.sum_bytes.contains(tb.map(_ & 0xff).map(_.toLong).sum))
    assert(!Multimodal.decodeGzip(MediaIn(1L,
      Multimodal.gzipBytes(tb, corruptHdr = true, corruptTrailer = false))).ok)
    assert(!Multimodal.decodeGzip(MediaIn(1L,
      Multimodal.gzipBytes(tb, corruptHdr = false, corruptTrailer = true))).ok,
      "a flipped ISIZE byte must fail the trailer check after a full inflate")
    // truncated deflate body: inflater stalls -> reject, not hang
    val good = Multimodal.gzipBytes(tb, corruptHdr = false, corruptTrailer = false)
    assert(!Multimodal.decodeGzip(MediaIn(1L,
      good.take(12) ++ good.takeRight(8))).ok)
  }

  test("gzip: FHCRC header field is verified, not skipped") {
    val tb = "header crc coverage".getBytes("UTF-8")
    val base = Multimodal.gzipBytes(tb, corruptHdr = false, corruptTrailer = false)
    // Set FLG.FHCRC and splice the CRC16 (low 16 bits of CRC32 over the
    // 10-byte fixed header, which is all that precedes it here) after it.
    def withFhcrc(crcXor: Int): Array[Byte] = {
      val hdr = base.take(10)
      hdr(3) = (hdr(3) | 2).toByte
      val c = new java.util.zip.CRC32
      c.update(hdr, 0, 10)
      val v = ((c.getValue & 0xffffL).toInt ^ crcXor)
      hdr ++ Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte) ++ base.drop(10)
    }
    val okOut = Multimodal.decodeGzip(MediaIn(2L, withFhcrc(0)))
    assert(okOut.ok && okOut.n_bytes.contains(tb.length.toLong),
      "a correct FHCRC member must decode identically")
    assert(!Multimodal.decodeGzip(MediaIn(2L, withFhcrc(0x5a5a))).ok,
      "a corrupted header CRC16 must reject even though the body inflates")
  }

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
