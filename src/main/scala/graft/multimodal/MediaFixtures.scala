package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic synthetic media payloads, parameterized by asset id.
  *
  * These are REAL encoded files — PNG via the JDK's ImageIO writer, WAV as a
  * hand-built RIFF/PCM16 container, video as an animated GIF written frame by
  * frame through ImageIO's sequence writer — whose decoded properties
  * (dimensions, channel count, sample rate, frame count, per-frame pixel
  * sums, RMS) are pure arithmetic over the id. That closes the oracle loop for the decode gates: the engine
  * encodes → decodes distributed on executors, while DuckDB recomputes the
  * expected metrics from the id without ever seeing a byte of payload.
  *
  * Every formula here is mirrored verbatim in the q54/q204 oracle SQL; change
  * them together or the hash gate fails loudly.
  */
object MediaFixtures {

  ImageIO.setUseCache(false) // in-memory streams; no temp-file per encode

  // ---- image: PNG, dimensions and colorspace derived from id ----

  def imageWidth(id: Long): Int  = 8 + (id % 16).toInt
  def imageHeight(id: Long): Int = 8 + ((id / 16) % 16).toInt
  /** Even ids encode grayscale (1 band after decode), odd ids RGB (3). */
  def imageGray(id: Long): Boolean = id % 2 == 0

  def pngPayload(id: Long): Array[Byte] = {
    val w = imageWidth(id)
    val h = imageHeight(id)
    val kind =
      if (imageGray(id)) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR
    val img = new BufferedImage(w, h, kind)
    // raster samples, not setRGB: on TYPE_BYTE_GRAY setRGB routes the
    // value through sRGB->gray color conversion (gamma LUT), so the
    // decoded sample would NOT be the formula value — and the resize
    // gate (q223) oracle-checks actual pixel arithmetic
    val raster = img.getRaster
    val bands = raster.getNumBands
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + id) % 255).toInt
        var b = 0
        while (b < bands) { raster.setSample(x, y, b, v); b += 1 }
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- audio: WAV (RIFF/PCM16 mono), constant-amplitude signal ----
  // A constant signal makes the decoded RMS exactly amplitude/32768: the
  // sum of squares is an exact integer < 2^53, its mean is the exact
  // perfect square amp^2, and IEEE sqrt of a perfect square is exact — so
  // the oracle's arithmetic reproduces the engine's decoded RMS bit-for-bit.

  def audioRate(id: Long): Int      = 8000 * (1 + (id % 3).toInt)
  def audioFrames(id: Long): Int    = 100 + (id % 50).toInt
  def audioAmplitude(id: Long): Int = 1000 + (id % 7).toInt * 500

  def wavPayload(id: Long): Array[Byte] = {
    val rate = audioRate(id)
    val n = audioFrames(id)
    val amp = audioAmplitude(id)
    val dataSize = n * 2 // PCM16 mono
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(rate)
    buf.putInt(rate * 2) // byte rate
    buf.putShort(2)      // block align
    buf.putShort(16)     // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(amp.toShort); i += 1 }
    buf.array()
  }

  // ---- video: animated GIF (multi-frame container the JDK really demuxes).
  // Each frame is a constant gray value through an EXPLICIT 256-level
  // grayscale palette: the default GIF writer quantizes to its own palette
  // (measured: value 7 decoded back as 1), but with an identity
  // IndexColorModel the LZW round-trip is bit-exact, so every decoded
  // frame's dimensions and pixel sum are pure arithmetic over (id, frame) ----

  def videoWidth(id: Long): Int      = 8 + (id % 9).toInt
  def videoHeight(id: Long): Int     = 8 + ((id / 9) % 9).toInt
  def videoFrameCount(id: Long): Int = 3 + (id % 6).toInt
  /** Constant pixel value of frame `f` — proves the demux yields the right
    * frame in the right order, not just the right count. */
  def framePixel(id: Long, f: Int): Int = ((id + 17L * f) % 251).toInt

  private val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  def gifPayload(id: Long): Array[Byte] = {
    val w = videoWidth(id)
    val h = videoHeight(id)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < videoFrameCount(id)) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        val v = framePixel(id, f)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Deliberately undecodable bytes for the reject-path gates. */
  def corruptPayload(id: Long): Array[Byte] =
    s"NOT_A_MEDIA_FILE_$id".getBytes("US-ASCII")
}
