package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL multi-frame (video-tier) codec on the pure-JVM `javax.imageio`
  * stack: animated GIF — a genuine frame-sequenced container format
  * with a real encoder and decoder in the JDK — replaces the media
  * layer's video stub. An 8-bit grayscale frame fits GIF's 256-color
  * palette exactly, so encoding is lossless and the decoded frame
  * statistics equal integer functions of the source pixels — the same
  * oracle-without-a-codec discipline as [[ImageCodec]] (PNG) and
  * [[AudioCodec]] (PCM WAV), now for the frame axis: per-frame decode,
  * per-frame exact luma, and every-k-th frame sampling all run against
  * real container bytes.
  *
  * Scale: pure bytes-in/values-out per record, mapPartitions-streamed
  * like the other media operators.
  */
object VideoCodec {

  locally { System.setProperty("java.awt.headless", "true"): Unit }

  // memory-backed ImageIO streams (no temp file per encode/decode) —
  // see the rationale at the same init in [[ImageCodec]]
  locally { ImageIO.setUseCache(false) }

  /** Encode gray frames (each w*h row-major pixels) as an animated GIF. */
  def grayFramesToGif(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == w * h,
      s"${f.length} pixels for ${w}x$h frame"))
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // interlacing OFF: the JDK GIF writer defaults to interlaced row
      // order, which its own reader mis-places on small frames
      // (observed: 4x4 frames come back row-scrambled with a lost row);
      // sequential rows round-trip exactly
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      frames.foreach { pixels =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, w, h, pixels)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          param)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Decode every frame of a multi-frame payload (animated GIF; any
    * ImageIO multi-image container). None on null/corrupt bytes.
    */
  def decodeFrames(payload: Array[Byte]): Option[(String, Seq[BufferedImage])] = {
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
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          Some((reader.getFormatName.toLowerCase,
            (0 until n).map(reader.read)))
        } finally reader.dispose()
      } finally if (stream != null) stream.close()
    } catch { case _: Exception => None }
  }

  /** Exact per-frame luma sums: (format, Seq(sumLuma per frame)). The
    * per-pixel luma is [[ImageCodec]]'s (gray band, BT.601 for color).
    */
  def frameLumas(payload: Array[Byte]): Option[(String, Seq[Long])] =
    decodeFrames(payload).map { case (fmt, frames) =>
      (fmt, frames.map(sumLuma))
    }

  /** Exact luma sum of one decoded frame (public for the frame-level
    * Spark operator). */
  def frameLumaOf(img: BufferedImage): Long = sumLuma(img)

  private def sumLuma(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
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
        while (x < w) {
          val argb = img.getRGB(x, y)
          val r = (argb >> 16) & 0xff
          val g = (argb >> 8) & 0xff
          val b = argb & 0xff
          sum += (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
    }
    sum
  }

  /** Every `every`-th decoded frame re-encoded as a standalone PNG —
    * REAL frame sampling out of a real container (the stub's contract,
    * now decoding actual bytes). Frame indices are the ORIGINAL ones.
    */
  def sampleFramesPng(payload: Array[Byte], every: Int): Seq[(Int, Array[Byte])] = {
    require(every > 0, "every must be positive")
    decodeFrames(payload).toSeq.flatMap { case (_, frames) =>
      frames.zipWithIndex.collect { case (img, i) if i % every == 0 =>
        val out = new ByteArrayOutputStream()
        ImageIO.write(img, "png", out)
        (i, out.toByteArray)
      }
    }
  }
}
