package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec over the JDK's built-in WAV reader/writer
  * (`javax.sound.sampled` — pure JVM, no native libs, headless-safe).
  * Backs the multimodal pipeline's decode stage for audio kinds the
  * same way [[ImageCodec]] backs image kinds: payload bytes in, decoded
  * samples out, integer features derived from the DECODED signal so
  * results are container-invariant (any valid PCM16 WAV of the same
  * signal yields identical features under any partitioning).
  *
  * All-integer arithmetic; every feature value is bounded well under 2^31
  * per item, so ANSI-mode Long sums over billions of clips can't overflow.
  */
object AudioCodec {

  /** Fixed 8-dim integer feature vector (matches StubCodec.Dim):
    * [sampleRateHz, channels, nFrames, durationMs, meanAbs, peak,
    *  zeroCrossings, meanSquare].
    */
  val Dim = 8

  /** Decoded clip: interleaved PCM16 samples + format facts. */
  final case class AudioClip(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decode a WAV payload to PCM16 samples. None when the bytes aren't a
    * format the JDK reads or the encoding isn't 16-bit PCM. */
  def decode(payload: Array[Byte]): Option[AudioClip] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED || fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val samples = new Array[Short](n)
          val le = !fmt.isBigEndian
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1) & 0xff
            samples(i) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
            i += 1
          }
          Some(AudioClip(fmt.getSampleRate.round, fmt.getChannels, samples))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Features from DECODED samples (channel-interleaved stream treated as
    * one signal). meanSquare fits in an Int range: max 32767² ≈ 1.07e9 <
    * 2^31; duration is millis (clip-bounded); zero crossings counted on
    * sign changes of consecutive samples. */
  /** Rolling hash over DECODED PCM samples — the audio twin of
    * ImageCodec.pixelChecksum: container-invariant (same signal in any
    * valid PCM16 WAV → same value), bounded < 2^31 for ANSI-safe sums. */
  def pcmChecksum(clip: AudioClip): Long = {
    var hsh = 5381L
    var i = 0
    while (i < clip.samples.length) {
      hsh = (hsh * 33 + (clip.samples(i) & 0xffff)) % 2147483647L; i += 1
    }
    hsh
  }

  def features(clip: AudioClip): Array[Long] = {
    val s = clip.samples
    val n = math.max(s.length, 1)
    var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      val a = math.abs(v)
      sumAbs += a; sumSq += v * v
      if (a > peak) peak = a
      if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0))) zc += 1
      i += 1
    }
    val frames = s.length / math.max(clip.channels, 1)
    val durMs = frames.toLong * 1000 / math.max(clip.sampleRate, 1)
    Array(clip.sampleRate.toLong, clip.channels.toLong, frames.toLong, durMs,
      sumAbs / n, peak, zc, sumSq / n)
  }

  /** Deterministic PCM16 mono WAV encode — used to synthesize audio
    * payloads in tests and the m04 audio path. Little-endian PCM16 WAV
    * round-trips EXACTLY through the JDK reader (verified in
    * MultimodalSpec), which is what lets the pipeline assert on decoded
    * sample values rather than container bytes. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
    out.toByteArray
  }
}
