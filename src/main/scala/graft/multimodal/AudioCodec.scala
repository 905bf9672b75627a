package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

/** REAL audio codec on the pure-JVM `javax.sound.sampled` stack — WAV
  * (RIFF/PCM) decode and encode with no native or third-party
  * libraries, replacing the media layer's stub for the audio modality.
  * Everything downstream of the decoder is deterministic integer
  * arithmetic (energy as a sum of squares, zero crossings as sign-flip
  * counts), so decoded statistics sit under the engine's hash-exact
  * oracle discipline exactly like [[ImageCodec]]: PCM in a WAV
  * container is lossless, so an encode → decode round trip reproduces
  * the source samples bit for bit and a DuckDB oracle can verify the
  * decoder by recomputing the same sums from the source series.
  *
  * Scale: pure bytes-in/values-out per record — executor-side map work
  * with no shared state, streaming through mapPartitions like every
  * other media operator.
  */
object AudioCodec {

  /** Decoded header + exact integer sample statistics of one PCM WAV
    * payload: sample rate (Hz), channel count, frame count, and over
    * channel 0 — the exact sum of squared 16-bit samples (energy) and
    * the zero-crossing count (strict sign flips, zeros carry the
    * previous sign).
    */
  final case class AudioInfo(sampleRate: Int, channels: Int,
      nFrames: Long, energy: Long, zeroCrossings: Long)

  /** Encode 16-bit signed PCM samples (one channel) as a WAV payload at
    * `sampleRate` Hz — little-endian PCM in a RIFF container, lossless.
    */
  def pcmToWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload to its 16-bit channel-0 samples and format;
    * None on null/corrupt/unsupported bytes (the quarantine path).
    * Only 8/16-bit PCM is read (8-bit is widened to 16 by <<8, the
    * standard lossless embedding).
    */
  def decode(payload: Array[Byte]): Option[(AudioFormat, Array[Short])] = {
    if (payload == null || payload.length == 0) return None
    try {
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getEncoding != AudioFormat.Encoding.PCM_UNSIGNED)
          return None
        if (bits != 8 && bits != 16) return None
        val raw = in.readAllBytes()
        val ch = fmt.getChannels
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val n = raw.length / frameBytes
        val outArr = new Array[Short](n)
        var i = 0
        while (i < n) {
          val off = i * frameBytes // channel 0 leads each frame
          val v =
            if (bits == 16) {
              val lo = raw(off) & 0xff
              val hi = raw(off + 1).toInt // signed high byte
              val s =
                if (fmt.isBigEndian) ((raw(off).toInt << 8) | (raw(off + 1) & 0xff))
                else ((hi << 8) | lo)
              // 16-bit unsigned stores sample + 32768; recenter like the
              // 8-bit path (reading it as signed would flip the waveform's
              // halves and corrupt energy / zero-crossing stats)
              if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                (s & 0xffff) - 32768
              else s
            } else {
              // 8-bit WAV is unsigned by convention; center then widen
              val u = raw(off) & 0xff
              val centered =
                if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                  u - 128
                else raw(off).toInt
              centered << 8
            }
          outArr(i) = v.toShort
          i += 1
        }
        Some((fmt, outArr))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Header + exact integer statistics; None on undecodable payloads. */
  def audioInfo(payload: Array[Byte]): Option[AudioInfo] =
    decode(payload).map { case (fmt, samples) =>
      var energy = 0L
      var zc = 0L
      var prevSign = 0 // 0 until the first nonzero sample
      var i = 0
      while (i < samples.length) {
        val s = samples(i).toLong
        energy += s * s
        val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
        if (prevSign != 0 && sign != 0 && sign != prevSign) zc += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels,
        samples.length.toLong, energy, zc)
    }

  /** Deterministic frame-level energy series: the payload's channel-0
    * samples cut into `frameLen`-sample frames (last partial frame
    * kept), each frame's exact sum of squares — the audio analog of the
    * image thumbnail: a fixed-rate feature series for the vector layer.
    */
  def frameEnergies(payload: Array[Byte], frameLen: Int): Option[Array[Long]] = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    decode(payload).map { case (_, samples) =>
      val n = (samples.length + frameLen - 1) / frameLen
      val out = new Array[Long](n)
      var i = 0
      while (i < samples.length) {
        val s = samples(i).toLong
        out(i / frameLen) += s * s
        i += 1
      }
      out
    }
  }
}
