package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioCodec, Media}

/** REAL WAV decode on real bytes: PCM round trips, exact energy and
  * zero-crossing arithmetic (including the zero-sample carry rule),
  * frame energies, corrupt-payload quarantine, and the Spark operators
  * over a real audio table.
  */
class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WAV encode -> decode round trip is sample-exact") {
    val samples = Array[Short](0, 100, -200, 32767, -32768, 5)
    val wav = AudioCodec.pcmToWav(samples, 8000)
    assert(new String(wav.take(4)) == "RIFF")
    val Some((fmt, decoded)) = AudioCodec.decode(wav)
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("audioInfo: exact energy and zero crossings with the zero-carry rule") {
    // signs: + + - - (zero carries the minus) - + => crossings at
    // 100->-200 and (-5,0,0)->7: exactly 2
    val samples = Array[Short](3, 100, -200, -5, 0, 0, 7)
    val wav = AudioCodec.pcmToWav(samples, 16000)
    val Some(info) = AudioCodec.audioInfo(wav)
    assert(info.sampleRate == 16000 && info.channels == 1)
    assert(info.nFrames == 7L)
    assert(info.energy == samples.map(s => s.toLong * s).sum)
    assert(info.zeroCrossings == 2L)
    // leading zeros have no sign: no crossing into the first nonzero
    val lead = AudioCodec.audioInfo(
      AudioCodec.pcmToWav(Array[Short](0, 0, -4, 4), 8000)).get
    assert(lead.zeroCrossings == 1L)
  }

  test("frameEnergies: exact per-frame sums, last partial frame kept") {
    val samples = Array[Short](1, 2, 3, 4, 5)
    val wav = AudioCodec.pcmToWav(samples, 8000)
    val Some(es) = AudioCodec.frameEnergies(wav, 2)
    assert(es.toSeq == Seq(1L + 4L, 9L + 16L, 25L))
  }

  test("corrupt / empty / non-audio payloads quarantine as None") {
    assert(AudioCodec.audioInfo(null).isEmpty)
    assert(AudioCodec.audioInfo(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.audioInfo("not audio at all".getBytes).isEmpty)
    val wav = AudioCodec.pcmToWav(Array[Short](1, 2, 3), 8000)
    assert(AudioCodec.audioInfo(wav.take(10)).isEmpty)
  }

  test("textAsWav + audioMeta: decoded statistics equal ascii functions") {
    val docs = Seq((1L, "ab a"), (2L, "")).toDF("doc_id", "text")
    val meta = Media.audioMeta(Media.textAsWav(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // "ab a": codes 97 98 32 97 -> samples (33,34,-32,33)*256
    val s = Seq(33, 34, -32, 33).map(_ * 256L)
    assert(meta(1L) ==
      ((8000, 1, 4L, s.map(v => v * v).sum, 2L)))
    assert(meta(2L) == ((8000, 1, 0L, 0L, 0L)))
  }

  test("audioFrameEnergies over the media table, quarantine drops out") {
    val good = Media.textAsWav(Seq((1L, "abcd")).toDF("doc_id", "text"),
      "doc_id", "text")
    val bad = Seq((2L, "garbage".getBytes)).toDF("media_id", "payload")
    val frames = Media.audioFrameEnergies(
        good.select(col("media_id"), col("payload")).union(bad), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c = "abcd".map(ch => (ch.toInt - 64) * 256L)
    assert(frames == Map(
      (1L, 0L) -> (c(0) * c(0) + c(1) * c(1)),
      (1L, 1L) -> (c(2) * c(2) + c(3) * c(3))))
  }
}
