package graft.engine

/** Pure-JVM media codecs for the multimodal column surface: binary PPM (P6)
  * raster images and PCM16 WAV audio — formats fully parseable without
  * native libraries, so decode runs inside executors with zero dependencies
  * and the feature-extraction path is REAL end-to-end (payload bytes ->
  * pixels/samples -> numeric features). Production codecs (JPEG, FLAC, ...)
  * slot in behind the same two contracts: bytes -> Option[Raster] and
  * bytes -> Option[Pcm]; a payload neither codec accepts falls back to
  * [[Multimodal.decodeStub]].
  *
  * Everything here is per-item CPU work with no allocation surprises —
  * exactly what runs inside a `mapPartitions` iterator at scale.
  */
object Codecs {

  /** Decoded raster: packed RGB, row-major, 3 bytes/pixel. */
  final case class Raster(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded audio: first channel of a PCM16 stream. */
  final case class Pcm(sampleRate: Int, samples: Array[Short])

  // ---------------------------------------------------------------- images

  /** Binary PPM (P6, maxval 255): `P6 <w> <h> <maxval>` header with
    * whitespace separators and `#` comments, one whitespace byte, then
    * w*h*3 raw RGB bytes. Returns None for anything malformed or truncated
    * (never throws — undecodable payloads must flow to the fallback). */
  def decodePpm(payload: Array[Byte]): Option[Raster] =
    decodePpmAt(payload, 0).map(_._1)

  /** One P6 frame starting at `start`, plus the offset just past its raster
    * — the container walk for [[decodePpmFrames]]. Same tolerance as
    * [[decodePpm]]: trailing bytes after the raster are the NEXT frame's
    * problem, anything malformed is None. With `copyRaster = false` the
    * frame is validated and skipped without copying its pixels (the
    * returned Raster shares a zero-length placeholder) — the cheap-advance
    * path for strided sampling. */
  private def decodePpmAt(payload: Array[Byte], start: Int,
      copyRaster: Boolean = true): Option[(Raster, Int)] = {
    var i = start
    def skipWs(): Unit = {
      var go = true
      while (go && i < payload.length) {
        val c = payload(i)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = i
      var v = 0L
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (payload(i) - '0')
        i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    if (payload.length < start + 2 || payload(start) != 'P' || payload(start + 1) != '6')
      return None
    i = start + 2
    val parsed = for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
    } yield (w, h, maxval)
    parsed match {
      case Some((w, h, 255)) if w > 0 && h > 0 &&
          w.toLong * h * 3 <= Int.MaxValue =>
        // exactly one whitespace byte after the header — anything else
        // (e.g. a comment or junk directly after the maxval) would shift
        // the raster read and silently decode garbage
        if (i >= payload.length || !(payload(i) == ' ' || payload(i) == '\t' ||
            payload(i) == '\r' || payload(i) == '\n')) return None
        i += 1
        val need = w * h * 3
        // Long compare: i + need can wrap Int for near-Int.MaxValue pixel
        // counts, which would turn the truncation guard into a crash
        if (i.toLong + need <= payload.length) {
          val rgb =
            if (copyRaster) java.util.Arrays.copyOfRange(payload, i, i + need)
            else Array.emptyByteArray
          Some((Raster(w, h, rgb), i + need))
        } else None
      case _ => None
    }
  }

  /** Concatenated-P6 video container ("MJPEG-style": each frame a complete
    * P6 image, frames back to back): walks the payload frame by frame and
    * returns every decoded raster. Decoding stops at the first byte that is
    * not a valid frame start — a payload that is not a P6 container yields
    * Nil (and flows to the byte-chunk fallback), a truncated final frame
    * yields the complete frames before it. Frames may differ in size. */
  def decodePpmFrames(payload: Array[Byte]): Vector[Raster] =
    decodePpmFramesSampled(payload, 1).map(_._2)

  /** Every `stride`-th frame of a concatenated-P6 container, with its frame
    * index. Skipped frames are advanced over by HEADER PARSE ONLY — their
    * rasters are never copied — so sampling a long video at stride 30 does
    * ~1/30th of the byte copying and holds only the kept frames in memory.
    * Same stop conditions as [[decodePpmFrames]]. */
  def decodePpmFramesSampled(payload: Array[Byte], stride: Int): Vector[(Int, Raster)] = {
    require(stride > 0, s"stride must be positive (got $stride)")
    val out = Vector.newBuilder[(Int, Raster)]
    var off = 0
    var idx = 0
    var go = true
    while (go && off < payload.length) {
      decodePpmAt(payload, off, copyRaster = idx % stride == 0) match {
        case Some((r, next)) =>
          if (idx % stride == 0) out += ((idx, r))
          off = next
          idx += 1
        case None => go = false
      }
    }
    out.result()
  }

  /** Concatenated-P6 container writer (test fixtures / transcode output).
    * Single allocation — per-frame `++` would copy the accumulated prefix
    * once per frame (quadratic in container size). */
  def encodePpmFrames(frames: Seq[Raster]): Array[Byte] =
    Array.concat(frames.map(encodePpm): _*)

  def encodePpm(r: Raster): Array[Byte] = {
    val header = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.rgb, 0, out, header.length, r.rgb.length)
    out
  }

  /** Nearest-neighbor resample (the deterministic O(tw*th) baseline —
    * area-average is a drop-in upgrade behind the same signature). */
  def resizeRaster(r: Raster, tw: Int, th: Int): Raster = {
    require(tw > 0 && th > 0, "target dims must be positive")
    require(tw.toLong * th * 3 <= Int.MaxValue,
      s"target raster ${tw}x$th does not fit a JVM array")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * r.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * r.width / tw).toInt
        val s = (sy * r.width + sx) * 3
        val d = (y * tw + x) * 3
        out(d) = r.rgb(s); out(d + 1) = r.rgb(s + 1); out(d + 2) = r.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Raster(tw, th, out)
  }

  /** grid x grid mean-pooled grayscale (Rec.601 luma scaled to [0,1]):
    * a real, deterministic image feature vector of length grid*grid. One
    * pass over the pixels — each source pixel accumulates into the cell it
    * maps to, so rasters smaller than the grid simply leave unhit cells 0. */
  def grayFeatures(r: Raster, grid: Int): Array[Float] = {
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < r.height) {
      val gy = (y.toLong * grid / r.height).toInt
      var x = 0
      while (x < r.width) {
        val gx = (x.toLong * grid / r.width).toInt
        val s = (y * r.width + x) * 3
        val luma = 0.299 * (r.rgb(s) & 0xff) + 0.587 * (r.rgb(s + 1) & 0xff) +
          0.114 * (r.rgb(s + 2) & 0xff)
        val cell = gy * grid + gx
        sums(cell) += luma / 255.0
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0) 0f else (sums(c) / counts(c)).toFloat)
  }

  /** 64-bit perceptual AVERAGE HASH (aHash) of a raster: 8x8 mean-pooled
    * luma cells ([[grayFeatures]]), bit i set iff cell i exceeds the mean
    * of the 64 cells. Near-identical images differ in a few bits (Hamming
    * distance), unrelated ones in ~32 — the classic cheap image near-dup
    * fingerprint. Deterministic: double arithmetic over a fixed pooling
    * and a fixed comparison, no RNG. The banded-candidate near-dup over
    * these hashes is the q_image_neardup shape (its declared query runs
    * the same aHash construction over the byte-luma stand-in payloads so
    * the DuckDB oracle can mirror it; this raster form is pinned by
    * MultimodalSpec on real P6 frames). */
  def aHash64(r: Raster): Long = {
    val cells = grayFeatures(r, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  // ----------------------------------------------------------------- audio

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** RIFF/WAVE with a PCM (format 1) 16-bit `fmt ` chunk: returns the FIRST
    * channel of the `data` chunk. Chunk walk honors the even-size padding
    * rule. None for anything else (compressed, 8/24-bit, truncated). */
  def decodeWavPcm16(payload: Array[Byte]): Option[Pcm] = {
    if (payload.length < 12 || tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE")
      return None
    var i = 12
    var sampleRate = 0
    var blockAlign = 0
    var ok = false
    var data: Option[(Int, Int)] = None // (offset, size)
    while (i + 8 <= payload.length && (data.isEmpty || !ok)) {
      val id = tag(payload, i)
      val size = le32(payload, i + 4)
      // Long compare: a crafted ~2^31 chunk size would wrap i + 8 + size
      // negative, escape this guard, and crash the chunk walk
      if (size < 0 || i.toLong + 8 + size > payload.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val fmt = le16(payload, i + 8)
          val bits = le16(payload, i + 8 + 14)
          sampleRate = le32(payload, i + 8 + 4)
          blockAlign = le16(payload, i + 8 + 12)
          ok = fmt == 1 && bits == 16 && sampleRate > 0 && blockAlign >= 2
        case "data" => data = Some((i + 8, size))
        case _ => ()
      }
      i += 8 + size + (size & 1) // chunks are padded to even length
    }
    data match {
      case Some((off, size)) if ok =>
        val n = size / blockAlign
        val out = new Array[Short](n)
        var s = 0
        while (s < n) {
          out(s) = le16(payload, off + s * blockAlign).toShort
          s += 1
        }
        Some(Pcm(sampleRate, out))
      case _ => None
    }
  }

  /** Minimal mono PCM16 WAV writer (test fixtures + resample output). */
  def encodeWavPcm16(p: Pcm): Array[Byte] = {
    val dataSize = p.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(p.sampleRate).putInt(p.sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    p.samples.foreach(out.putShort)
    out.array()
  }

  /** `frames` RMS energies over equal sample windows, normalized to [0,1] —
    * the standard fixed-shape waveform summary. Empty windows (fewer
    * samples than frames) are 0. */
  def rmsFeatures(samples: Array[Short], frames: Int): Array[Float] = {
    Array.tabulate(frames) { f =>
      val from = (f.toLong * samples.length / frames).toInt
      val until = ((f + 1).toLong * samples.length / frames).toInt
      if (until <= from) 0f
      else {
        var acc = 0.0
        var i = from
        while (i < until) { val s = samples(i).toDouble; acc += s * s; i += 1 }
        (math.sqrt(acc / (until - from)) / 32768.0).toFloat
      }
    }
  }
}
