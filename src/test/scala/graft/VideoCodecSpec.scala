package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageCodec, Media, VideoCodec}

/** REAL multi-frame decode on real animated-GIF bytes: frame-exact
  * round trips, per-frame luma, every-k-th frame sampling to decodable
  * PNGs, corrupt-payload quarantine, and the Spark operators.
  */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 37 + i * 11) % 256).toByte)

  test("animated GIF encode -> decode round trip is frame- and pixel-exact") {
    val frames = Seq(frame(1, 64), frame(2, 64), frame(3, 64))
    val gif = VideoCodec.grayFramesToGif(frames, 8, 8)
    assert(new String(gif.take(3)) == "GIF")
    val Some((fmt, decoded)) = VideoCodec.decodeFrames(gif)
    assert(fmt == "gif" && decoded.length == 3)
    decoded.zip(frames).foreach { case (img, src) =>
      assert(img.getWidth == 8 && img.getHeight == 8)
      val px = Array.tabulate(64) { i =>
        // decoded GIF frames come back through a palette color model:
        // read via getRGB and take one channel (gray palette => r=g=b)
        (img.getRGB(i % 8, i / 8) & 0xff).toByte
      }
      assert(px.toSeq == src.toSeq)
    }
  }

  test("frameLumas: exact per-frame sums") {
    val f1 = Array.tabulate(16)(i => i.toByte)          // sum 120
    val f2 = Array.tabulate(16)(i => (10 + i).toByte)   // sum 280
    val gif = VideoCodec.grayFramesToGif(Seq(f1, f2), 4, 4)
    val Some((_, lumas)) = VideoCodec.frameLumas(gif)
    assert(lumas == Seq(120L, 280L))
  }

  test("sampleFramesPng: every-k-th original index, PNGs decode to the frame") {
    val frames = (0 until 5).map(s => frame(s, 16))
    val gif = VideoCodec.grayFramesToGif(frames, 4, 4)
    val sampled = VideoCodec.sampleFramesPng(gif, every = 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    sampled.foreach { case (i, png) =>
      val Some(info) = ImageCodec.imageInfo(png)
      assert(info.width == 4 && info.height == 4)
      assert(info.sumLuma == frames(i).map(b => (b & 0xff).toLong).sum)
    }
  }

  test("corrupt / empty / non-video payloads quarantine as None") {
    assert(VideoCodec.decodeFrames(null).isEmpty)
    assert(VideoCodec.decodeFrames(Array.empty[Byte]).isEmpty)
    assert(VideoCodec.decodeFrames("not a gif".getBytes).isEmpty)
  }

  test("textAsGif + videoFrameLuma: decoded frame lumas equal ascii " +
      "window sums; empty text still yields one (padded) frame") {
    val text140 = ("abcdefgh " * 16).trim.take(140)
    val docs = Seq((1L, text140), (2L, "short"), (3L, ""))
      .toDF("doc_id", "text")
    val frames = Media.videoFrameLuma(
        Media.textAsGif(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    def winSum(s: String, f: Int) =
      s.slice(f * 64, f * 64 + 64).map(_.toLong).sum
    // 140 chars -> 3 frames
    assert(frames.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L),
      (3L, 0L)))
    for (f <- 0 to 2)
      assert(frames((1L, f.toLong)) == ((8, 8, winSum(text140, f))))
    assert(frames((2L, 0L)) == ((8, 8, winSum("short", 0))))
    assert(frames((3L, 0L)) == ((8, 8, 0L)))
  }

  test("sampleFramesReal returns decodable PNG frame payloads") {
    val media = Media.textAsGif(
      Seq((7L, "x" * 200)).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Media.sampleFramesReal(media, every = 2).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    rows.foreach { r =>
      val png = r.getAs[Array[Byte]](2)
      assert(ImageCodec.imageInfo(png).exists(i => i.width == 8 && i.height == 8))
    }
  }
}
