package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec on the pure-JVM `javax.imageio` stack — no native
  * or third-party libraries, works headless — replacing the media
  * layer's stub for actual raster formats (PNG / BMP / GIF out of the
  * box). Everything is deterministic integer arithmetic so decoded
  * statistics can sit under the engine's hash-exact oracle discipline:
  * PNG is lossless, so an encode → decode round trip reproduces source
  * pixels bit for bit, which is exactly what lets a DuckDB oracle
  * verify the decoder end-to-end without being able to parse PNG
  * itself (it recomputes the same statistics from the source bytes).
  *
  * Scale: every function is pure bytes-in/values-out per record —
  * executor-side map work with no shared state, the same contract as
  * [[Media.StubCodec]]; a 100 TB image corpus streams through
  * mapPartitions batches exactly like the text operators.
  */
object ImageCodec {

  // ImageIO must never touch a display; required before any codec call
  // in driver-local tests (server JVMs usually default to headless)
  locally { System.setProperty("java.awt.headless", "true"): Unit }

  // ImageIO's default stream factories are FILE-cache-backed: every
  // createImageInputStream/OutputStream call creates (and deletes) a
  // temp file, so per-record encode/decode paid two disk round-trips
  // per payload — the dominant cost of the small-frame video path.
  // All payloads here are in-memory byte arrays; memory-backed streams
  // are bit-identical and touch no disk. Process-wide, set once.
  locally { ImageIO.setUseCache(false) }

  /** Decoded header + integer pixel statistics of one image payload:
    * format name (lower case), dimensions, and the exact integer sum of
    * 8-bit luma over all pixels (gray band for grayscale images;
    * ITU-R BT.601 integer weights (299r + 587g + 114b)/1000, truncated,
    * for color — deterministic on every JVM).
    */
  final case class ImageInfo(format: String, width: Int, height: Int,
      sumLuma: Long)

  /** Decode any ImageIO-supported payload; None on null/corrupt/
    * unsupported bytes (the quarantine path, never an exception).
    */
  def decode(payload: Array[Byte]): Option[(String, BufferedImage)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val stream = ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(stream)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(stream)
          val img = reader.read(0)
          if (img == null) None
          else Some((reader.getFormatName.toLowerCase, img))
        } finally reader.dispose()
      } finally if (stream != null) stream.close()
    } catch { case _: Exception => None }
  }

  /** 8-bit luma of one packed ARGB pixel (BT.601 integer weights). */
  private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Header + exact luma statistics; None on undecodable payloads. */
  def imageInfo(payload: Array[Byte]): Option[ImageInfo] =
    decode(payload).map { case (fmt, img) =>
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
        // gray band directly: getRGB would re-map through the color
        // model; the raster sample IS the stored 8-bit value
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += luma(img.getRGB(x, y)); x += 1 }
          y += 1
        }
      }
      ImageInfo(fmt, w, h, sum)
    }

  /** Encode raw 8-bit gray pixels (row-major, length w*h) as PNG —
    * lossless, so decoding returns exactly these values.
    */
  def grayToPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"${pixels.length} pixels for ${w}x$h image")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Nearest-neighbor resize to `ow` x `oh` gray pixels — manual index
    * arithmetic over the decoded raster (no Graphics2D rendering
    * pipeline, whose antialiasing is not specified bit-exactly). The
    * sampled source pixel for output x is floor(x * iw / ow) — the
    * standard nearest-neighbor grid.
    */
  def resizeGray(img: BufferedImage, ow: Int, oh: Int): Array[Byte] = {
    require(ow > 0 && oh > 0, s"bad target ${ow}x$oh")
    val iw = img.getWidth
    val ih = img.getHeight
    val gray = img.getType == BufferedImage.TYPE_BYTE_GRAY
    val raster = img.getRaster
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * ih / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * iw / ow).toInt
        val v = if (gray) raster.getSample(sx, sy, 0)
                else luma(img.getRGB(sx, sy))
        out(y * ow + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** k x k gray thumbnail as unit-free floats in [0, 1] — the bridge
    * from the media column to the engine's vector layer (ANN / dedup /
    * k-means over image content).
    */
  def thumbnailVector(payload: Array[Byte], k: Int): Option[Array[Float]] =
    decode(payload).map { case (_, img) =>
      resizeGray(img, k, k).map(b => (b & 0xff) / 255.0f)
    }
}
