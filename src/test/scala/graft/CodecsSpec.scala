package graft

import graft.engine.{Codecs, MediaItem, Multimodal}
import graft.engine.Codecs.{Pcm, Raster}

/** Real-decoder coverage: the PPM and WAV codecs end-to-end (bytes ->
  * pixels/samples -> features), plus the Multimodal dispatch — a decodable
  * payload takes the codec path, junk bytes take the documented stub
  * fallback, and resize actually resamples rasters. */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  // 2x2 P6: red, green / blue, white — lumas 0.299, 0.587, 0.114, 1.0
  private val rgb2x2: Array[Byte] = Array(
    255, 0, 0, 0, 255, 0,
    0, 0, 255, 255, 255, 255).map(_.toByte)
  private val ppm2x2: Array[Byte] = Codecs.encodePpm(Raster(2, 2, rgb2x2))

  test("PPM decode: round trip, comments, malformed payloads") {
    val r = Codecs.decodePpm(ppm2x2).get
    assert(r.width == 2 && r.height == 2 && r.rgb.sameElements(rgb2x2))
    // header comments and extra whitespace are legal
    val commented = ("P6\n# a comment\n2 2\n# another\n255\n".getBytes("US-ASCII") ++ rgb2x2)
    assert(Codecs.decodePpm(commented).get.rgb.sameElements(rgb2x2))
    // malformed: wrong magic, truncated pixels, non-255 maxval, empty
    assert(Codecs.decodePpm("P5\n2 2\n255\n".getBytes ++ rgb2x2).isEmpty)
    assert(Codecs.decodePpm(ppm2x2.dropRight(1)).isEmpty)
    assert(Codecs.decodePpm("P6\n2 2\n65535\n".getBytes ++ rgb2x2).isEmpty)
    assert(Codecs.decodePpm(Array.emptyByteArray).isEmpty)
    assert(Codecs.decodePpm("not an image at all".getBytes).isEmpty)
    // crafted header whose pixel count nearly overflows Int: the bounds
    // check must stay in Long arithmetic and reject, not crash
    assert(Codecs.decodePpm("P6 715827882 1 255\n".getBytes("US-ASCII")).isEmpty)
    // junk (here: a comment) directly after the maxval instead of the single
    // whitespace byte would shift the raster read — must reject, not decode
    assert(Codecs.decodePpm("P6\n2 2\n255#c\n".getBytes("US-ASCII") ++ rgb2x2).isEmpty)
  }

  test("PPM gray features: exact mean-pooled luma") {
    val r = Codecs.decodePpm(ppm2x2).get
    val g1 = Codecs.grayFeatures(r, 1)
    assert(math.abs(g1(0) - 0.5f) < 1e-6, s"mean luma ${g1(0)}")
    val g2 = Codecs.grayFeatures(r, 2)
    val want = Array(0.299f, 0.587f, 0.114f, 1.0f)
    g2.lazyZip(want).foreach((a, b) => assert(math.abs(a - b) < 1e-6, s"$a vs $b"))
  }

  test("PPM nearest-neighbor resize picks the right source pixels") {
    val r = Codecs.decodePpm(ppm2x2).get
    val one = Codecs.resizeRaster(r, 1, 1)
    assert(one.rgb.sameElements(Array[Byte](255.toByte, 0, 0))) // pixel (0,0)
    val up = Codecs.resizeRaster(r, 4, 4) // each source pixel becomes 2x2
    assert(up.width == 4 && up.height == 4 && up.rgb.length == 48)
    val bl = (2 * 4 + 0) * 3 // (x=0, y=2) -> source (0,1) = blue
    assert(up.rgb(bl) == 0 && up.rgb(bl + 1) == 0 && (up.rgb(bl + 2) & 0xff) == 255)
  }

  test("concatenated-P6 container: frame walk, truncation, non-containers") {
    // three frames of different sizes and content, back to back
    val f0 = Raster(2, 2, rgb2x2)
    val f1 = Raster(1, 1, Array[Byte](255.toByte, 255.toByte, 255.toByte))
    val f2 = Raster(1, 2, Array[Byte](0, 0, 0, 255.toByte, 0, 0))
    val container = Codecs.encodePpmFrames(Seq(f0, f1, f2))
    val frames = Codecs.decodePpmFrames(container)
    assert(frames.size == 3)
    assert(frames(0).rgb.sameElements(rgb2x2))
    assert(frames(1).width == 1 && frames(1).height == 1)
    assert(frames(2).width == 1 && frames(2).height == 2)
    // truncated mid-frame: the complete leading frames still decode
    val truncated = Codecs.decodePpmFrames(container.dropRight(1))
    assert(truncated.size == 2)
    // junk between frames ends the walk at the last valid frame boundary
    val junkTail = Codecs.decodePpmFrames(Codecs.encodePpm(f0) ++ "garbage".getBytes)
    assert(junkTail.size == 1)
    // a non-container yields no frames (fallback path), never throws
    assert(Codecs.decodePpmFrames("plain text".getBytes).isEmpty)
    assert(Codecs.decodePpmFrames(Array.emptyByteArray).isEmpty)
    // strided sampling: skipped frames advance header-only, kept frames
    // carry the same rasters the full walk produces
    val sampled = Codecs.decodePpmFramesSampled(container, 2)
    assert(sampled.map(_._1) == Vector(0, 2))
    assert(sampled(0)._2.rgb.sameElements(frames(0).rgb))
    assert(sampled(1)._2.rgb.sameElements(frames(2).rgb))
  }

  test("WAV PCM16: encode/decode round trip and RMS features") {
    val samples = Array[Short](0, 16384, -16384, 32767)
    val wav = Codecs.encodeWavPcm16(Pcm(16000, samples))
    val p = Codecs.decodeWavPcm16(wav).get
    assert(p.sampleRate == 16000 && p.samples.sameElements(samples))
    val rms1 = Codecs.rmsFeatures(samples, 1)
    val want = math.sqrt(samples.map(s => s.toDouble * s).sum / 4) / 32768.0
    assert(math.abs(rms1(0) - want) < 1e-6)
    val rms2 = Codecs.rmsFeatures(samples, 2)
    assert(math.abs(rms2(0) - math.sqrt((16384.0 * 16384) / 2) / 32768.0) < 1e-6)
    // malformed payloads decode to None, never throw
    assert(Codecs.decodeWavPcm16("RIFFjunk".getBytes).isEmpty)
    assert(Codecs.decodeWavPcm16(ppm2x2).isEmpty)
    assert(Codecs.decodeWavPcm16(wav.dropRight(3)).isEmpty)
    // crafted chunk size ~2^31: Int arithmetic would wrap the bounds check
    // negative and crash the chunk walk — must reject in Long math
    val crafted = "RIFF".getBytes ++ Array[Byte](100, 0, 0, 0) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++
      Array[Byte](-1, -1, -1, 127) ++ Array.fill[Byte](8)(0)
    assert(Codecs.decodeWavPcm16(crafted).isEmpty)
  }

  test("extractFeatures dispatches: PPM -> luma grid, WAV -> RMS, junk -> stub") {
    val wav = Codecs.encodeWavPcm16(Pcm(8000, Array[Short](1000, -1000, 2000, -2000)))
    val items = Seq(
      MediaItem(1L, "image", ppm2x2, 2, 2, 0, 0L),
      MediaItem(2L, "audio", wav, 0, 0, 8000, 1L),
      MediaItem(3L, "image", "just some text bytes".getBytes, 0, 0, 0, 0L))
    val feats = Multimodal.extractFeatures(items.toDS(), dim = 4)
      .collect().map(f => f.media_id -> f).toMap
    // image: 2x2 luma grid exactly
    val want = Array(0.299f, 0.587f, 0.114f, 1.0f)
    feats(1L).feature.lazyZip(want).foreach((a, b) => assert(math.abs(a - b) < 1e-6))
    // audio: 4 RMS windows of one sample each
    val wantRms = Array(1000, 1000, 2000, 2000).map(s => (s / 32768.0).toFloat)
    feats(2L).feature.lazyZip(wantRms).foreach((a, b) => assert(math.abs(a - b) < 1e-6))
    // junk: falls back to the deterministic stub (stable across runs, right dim)
    val again = Multimodal.extractFeatures(items.toDS(), dim = 4)
      .filter(_.media_id == 3L).collect().head
    assert(feats(3L).feature.sameElements(again.feature))
    assert(feats(3L).feature.length == 4)
    assert(!feats(3L).feature.sameElements(want)) // stub, not the codec path
  }

  test("resize on a real PPM payload re-encodes the resampled raster") {
    val items = Seq(MediaItem(7L, "image", ppm2x2, 2, 2, 0, 0L)).toDS()
    val out = Multimodal.resize(items, targetW = 1, targetH = 1, dim = 4).collect().head
    assert(out.width == 1 && out.height == 1)
    val r = Codecs.decodePpm(out.payload).get
    assert(r.width == 1 && r.height == 1)
    assert(r.rgb.sameElements(Array[Byte](255.toByte, 0, 0)))
  }

  test("resize fallback caps the kept bytes on the Long, not after Int wrap") {
    // upscale from 1x1 metadata: the row-count product (len * 2.5e9)
    // overflows Int; the cap must keep the FULL payload, not wrap negative
    // and collapse it to 1 byte
    val junk = Array.fill[Byte](100)(42)
    val items = Seq(MediaItem(8L, "image", junk, 1, 1, 0, 0L)).toDS()
    val out = Multimodal.resize(items, targetW = 50000, targetH = 50000, dim = 4)
      .collect().head
    assert(out.payload.length == 100, s"kept ${out.payload.length} bytes")
  }
}
