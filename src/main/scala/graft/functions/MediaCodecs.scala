package graft.functions

/** Pure-JVM media codecs — no native or third-party codec libraries.
  *
  *   - WAV: RIFF container, PCM 8-bit unsigned / 16-bit signed LE, parsed
  *     directly (format spec: Microsoft/IBM RIFF WAVE, public since 1991)
  *   - BMP: BITMAPINFOHEADER, 24-bit uncompressed, bottom-up rows, parsed
  *     directly
  *   - PNG / JPEG / GIF: decoded through `javax.imageio` — compressed image
  *     codecs that SHIP IN THE JDK, so "no external libraries" still holds
  *
  * These make the multimodal decode path REAL for audio-PCM and for all
  * common image formats. Only compressed AUDIO/VIDEO codecs (MP3/H.264...)
  * remain behind the labeled stub — the JDK genuinely has none; swapping
  * the stub for a JNI/javacv decoder changes one function.
  *
  * Encoders exist so tests and fixtures can synthesize valid payloads
  * deterministically; decoders never throw on malformed input (None).
  */
object MediaCodecs {

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Int, durationMs: Double, rms: Double,
                           peak: Double)

  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  // ------------------------------------------------------------------ WAV

  /** Synthesize a mono 8-bit-unsigned-PCM WAV from raw sample bytes. */
  def encodeWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1.toShort)              // PCM
      .putShort(1.toShort)              // mono
      .putInt(sampleRate)
      .putInt(sampleRate)               // byte rate = rate * 1 ch * 1 B
      .putShort(1.toShort)              // block align
      .putShort(8.toShort)              // bits per sample
      .put("data".getBytes("ASCII")).putInt(n)
      .put(samples)
    buf.array()
  }

  /** Parse a RIFF/WAVE PCM payload: walks the chunk list (fmt before data,
    * unknown chunks skipped — the spec allows LIST/fact/etc. in between).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = b.getShort(off + 8).toInt
          if (audioFormat != 1) return None // PCM only
          fmt = Some((b.getShort(off + 10).toInt, b.getInt(off + 12),
            b.getShort(off + 22).toInt))
        case "data" => data = Some((off + 8, len))
        case _ => ()
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data
         if rate > 0 && channels > 0 && (bits == 8 || bits == 16)) yield {
      val bytesPerSample = bits / 8
      val frame = channels * bytesPerSample
      val nSamples = dLen / frame
      var sumSq = 0.0
      var peak = 0.0
      var i = 0
      while (i < nSamples * frame) {
        val v =
          if (bits == 8) ((bytes(dOff + i) & 0xff) - 128) / 128.0
          else b.getShort(dOff + i) / 32768.0
        sumSq += v * v
        val a = math.abs(v); if (a > peak) peak = a
        i += bytesPerSample
      }
      val total = nSamples.toLong * channels
      WavInfo(rate, channels, bits, nSamples,
        nSamples * 1000.0 / rate,
        if (total == 0) 0.0 else math.sqrt(sumSq / total),
        peak)
    }
  }

  /** RMS over `k` equal sample windows — a real per-window audio feature
    * (8-bit mono path; window boundaries by sample index).
    */
  def wavWindowRms(bytes: Array[Byte], k: Int): Array[Float] = {
    val out = new Array[Float](k)
    decodeWav(bytes) match {
      case Some(info) if info.bitsPerSample == 8 && info.nSamples > 0 =>
        // data chunk offset: re-walk (cheap; payloads are already in memory)
        val dataOff = findChunk(bytes, "data").getOrElse(return out)
        val n = info.nSamples
        val sumSq = new Array[Double](k)
        val cnt = new Array[Long](k)
        var i = 0
        while (i < n) {
          val w = (i.toLong * k / n).toInt
          val v = ((bytes(dataOff + i) & 0xff) - 128) / 128.0
          sumSq(w) += v * v; cnt(w) += 1
          i += 1
        }
        var w = 0
        while (w < k) {
          out(w) = if (cnt(w) == 0) 0f else math.sqrt(sumSq(w) / cnt(w)).toFloat
          w += 1
        }
        out
      case _ => out
    }
  }

  /** Integer-exact per-window energy over 8-bit mono PCM: window w of `k`
    * gets Σ(sample−128)² (exact in long — samples are 8-bit, so each term
    * ≤ 128² and 2⁶³ is unreachable at any real payload size) and its sample
    * count. The engine-exact sibling of [[wavWindowRms]]'s FP RMS
    * (rms_w = sqrt(sum_sq_w / (128² · n_w))) — pure integer arithmetic, so a
    * SQL oracle replays it bit-identically. Window boundaries by sample
    * index, same ⌊i·k/n⌋ rule as wavWindowRms.
    */
  def wavWindowEnergy(bytes: Array[Byte], k: Int): Option[Array[(Long, Long)]] =
    decodeWav(bytes) match {
      case Some(info) if info.bitsPerSample == 8 && info.nSamples > 0 =>
        findChunk(bytes, "data").map { dataOff =>
          val n = info.nSamples
          val sumSq = new Array[Long](k)
          val cnt = new Array[Long](k)
          var i = 0
          while (i < n) {
            val w = (i.toLong * k / n).toInt
            val d = (bytes(dataOff + i) & 0xff) - 128
            sumSq(w) += d.toLong * d
            cnt(w) += 1
            i += 1
          }
          Array.tabulate(k)(w => (sumSq(w), cnt(w)))
        }
      case _ => None
    }

  private def findChunk(bytes: Array[Byte], id: String): Option[Int] = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = new String(bytes, off, 4, "ASCII")
      val len = b.getInt(off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      if (tag == id) return Some(off + 8)
      off += 8 + len + (len & 1)
    }
    None
  }

  // ------------------------------------------------------------------ BMP

  /** Synthesize a 24-bit uncompressed BMP (bottom-up rows, 4-byte padded)
    * from row-major top-down (r,g,b) pixels.
    */
  def encodeBmp(width: Int, height: Int, rgb: Array[(Byte, Byte, Byte)]): Array[Byte] = {
    require(rgb.length == width * height, "pixel count must be width*height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val buf = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(y * width + x)
        buf.put(b).put(g).put(r) // BGR on disk
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BITMAPINFOHEADER BMP; channel means over
    * all pixels.
    */
  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    val hdrSize = b.getInt(14)
    if (hdrSize < 40) return None
    val width = b.getInt(18)
    val height = b.getInt(22)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    if (width <= 0 || height == 0 || bpp != 24 || compression != 0) return None
    val h = math.abs(height)
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    if (dataOff < 54 || dataOff.toLong + stride.toLong * h > bytes.length) return None
    var (sumR, sumG, sumB) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < h) {
      var x = 0
      val row = dataOff + y * stride
      while (x < width) {
        sumB += (bytes(row + x * 3) & 0xff)
        sumG += (bytes(row + x * 3 + 1) & 0xff)
        sumR += (bytes(row + x * 3 + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toDouble * h
    Some(BmpInfo(width, h, bpp, sumR / n, sumG / n, sumB / n))
  }

  // ------------------------------------------------------------------ AVI

  /** Synthesize a minimal MJPEG-in-AVI: RIFF('AVI ') with a LIST('hdrl')
    * (avih + one 'vids'/'MJPG' stream) and a LIST('movi') holding one
    * '00dc' chunk per JPEG frame. Enough structure for any MJPEG-aware
    * reader; fixture generation for the compressed-video decode path.
    */
  def encodeAviMjpeg(width: Int, height: Int, jpegFrames: Array[Array[Byte]],
                     fps: Int = 10): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("ASCII")).putInt(body.length).put(body)
      buf.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ASCII") ++ body)
    val maxFrame = if (jpegFrames.isEmpty) 0 else jpegFrames.map(_.length).max
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(jpegFrames.length).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("ASCII")).put("MJPG".getBytes("ASCII"))
      .putInt(0).putShort(0.toShort).putShort(0.toShort).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(jpegFrames.length)
      .putInt(maxFrame).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .put("MJPG".getBytes("ASCII")).putInt(width * height * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegFrames.flatMap(f => chunk("00dc", f)))
    chunk("RIFF", "AVI ".getBytes("ASCII") ++ hdrl ++ movi)
  }

  /** Decode the frames of an MJPEG-in-AVI payload: walk the RIFF chunk list
    * (same discipline as [[decodeWav]] — unknown chunks skipped), find
    * LIST('movi'), and feed every video-data subchunk ('##dc'/'##db')
    * through the existing JDK ImageIO JPEG path. Undecodable frames are
    * skipped, not fatal. Returns (frame_no, info) per decoded frame; None
    * when the payload is not a RIFF/AVI at all.
    */
  def decodeAviFrames(bytes: Array[Byte]): Option[Seq[(Int, BmpInfo)]] = {
    if (bytes == null || bytes.length < 12) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    // locate LIST('movi') among the top-level chunks
    var off = 12
    var movi: Option[(Int, Int)] = None // (body offset past 'movi' tag, end)
    while (off + 8 <= bytes.length && movi.isEmpty) {
      val id = tag(off)
      val len = b.getInt(off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return Some(Seq.empty)
      if (id == "LIST" && len >= 4 && tag(off + 8) == "movi")
        movi = Some((off + 12, off + 8 + len))
      off += 8 + len + (len & 1)
    }
    movi.map { case (start, end) =>
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, BmpInfo)]
      var o = start
      var frameNo = 0
      var truncated = false
      while (o + 8 <= end && !truncated) {
        val id = tag(o)
        val len = b.getInt(o + 4)
        if (len < 0 || o + 8 + len > end) truncated = true
        else {
          if (id.endsWith("dc") || id.endsWith("db")) {
            val frame = java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + len)
            decodeImage(frame).map(_._2).orElse(decodeBmp(frame))
              .foreach(info => frames += ((frameNo, info)))
            frameNo += 1
          }
          o += 8 + len + (len & 1)
        }
      }
      frames.toSeq
    }
  }

  /** Synthesize a JPEG via the JDK encoder (fixture generation). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[(Byte, Byte, Byte)]): Array[Byte] = {
    require(rgb.length == width * height, "pixel count must be width*height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(y * width + x)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  // --------------------------------------------- compressed images (JDK)

  /** Magic-byte sniff for the compressed image formats the JDK's ImageIO
    * decodes out of the box. Returns the MIME type, or None.
    */
  def imageFormat(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int) = bytes(i) & 0xff
    if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("image/png")
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some("image/jpeg")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("image/gif")
    else None
  }

  /** Decode a PNG/JPEG/GIF payload via `javax.imageio` (ships in the JDK —
    * zero new dependencies) into the same dims + channel-means shape as
    * [[decodeBmp]]. Returns (mimeType, info); None for non-image or
    * malformed payloads (ImageIO returning null or throwing).
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, BmpInfo)] =
    imageFormat(bytes).flatMap { fmt =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sumR, sumG, sumB) = (0.0, 0.0, 0.0)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sumR += (p >> 16) & 0xff
              sumG += (p >> 8) & 0xff
              sumB += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toDouble * h
          Some((fmt, BmpInfo(w, h, 24, sumR / n, sumG / n, sumB / n)))
        }
      } catch { case _: Exception => None }
    }

  /** Synthesize a PNG from RGB pixels (row-major) via the JDK encoder —
    * lossless, so decoded channel means are exactly the source means:
    * fixture generation for the oracle-checked compressed-decode path.
    */
  def encodePng(width: Int, height: Int, rgb: Array[(Byte, Byte, Byte)]): Array[Byte] = {
    require(rgb.length == width * height, "pixel count must be width*height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(y * width + x)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
