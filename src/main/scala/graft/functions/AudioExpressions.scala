package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Real audio decode, scan-side, JDK-only: parses WAV (RIFF/PCM) payloads
  * with `javax.sound.sampled.AudioSystem` — the reader bundled with the
  * JDK, no external audio libraries — and emits exact integer features:
  * `(sample_rate, channels, n_samples, sum_abs, zero_crossings)`.
  * `n_samples` counts PCM frames; `sum_abs` is the exact Σ|sample| over
  * every channel-interleaved 16-bit sample (a loudness measure with no
  * float rounding, so it is oracle-checkable); `zero_crossings` counts
  * sign boundaries `(s_i ≥ 0) ≠ (s_{i−1} ≥ 0)` (a pitch/noisiness
  * signal). Non-WAV, non-PCM-16, over-long, or mid-decode-failing
  * payloads yield NULL instead of failing the task — one corrupt blob
  * cannot kill a 100 TB scan. Decoding runs inside the scan projection:
  * no UDF serialization, no shuffle, the same placement as the image
  * decode expressions. */
// CodegenFallback here is DELIBERATE (r22 A/B): this kernel is expensive
// per row (real decode / line-split work), and inside a fused
// whole-stage span its evaluation can be duplicated across the filter
// and projection consumers of the output column — the focused bench read
// image_pairs 2.5 -> 3.3 s and corpus_dedup 3.5 -> 4.2 s with real
// doGenCode (KernelCodegen) before this was reverted. The fallback's
// forced materialization evaluates the kernel once per row; the span
// break it causes is noise next to the kernel's own cost. The CHEAP
// arithmetic kernels (shingles, signatures, hashes) take the opposite
// trade — see KernelCodegen.
case class AudioFeaturesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AudioFeaturesExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_features"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels <= 0 ||
          frames < 0 || frames > AudioFeaturesExpr.MaxFrames) null
        else {
          val channels = fmt.getChannels
          val big = fmt.isBigEndian
          val data = in.readAllBytes()
          val nSamples = data.length / 2
          var sumAbs = 0L
          var zc = 0L
          var prevNonNeg = true
          var i = 0
          while (i < nSamples) {
            val lo = data(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = data(2 * i + (if (big) 0 else 1)).toInt
            val s = (hi << 8) | lo
            sumAbs += math.abs(s)
            val nonNeg = s >= 0
            if (i > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            i += 1
          }
          InternalRow(fmt.getSampleRate.toInt, channels,
            nSamples.toLong / channels, sumAbs, zc)
        }
      } finally in.close()
    } catch {
      // any parse/read failure means "not decodable audio", never a dead
      // task — the same blanket guard as ImageDecode.withGuardedReader
      case _: Exception => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFeaturesExpr =
    copy(child = newChild)
}

object AudioFeaturesExpr {
  /** Largest frame count this expression will decode (16 M frames = 32 MB
    * mono PCM) — payloads declaring more are treated as non-decodable
    * rather than allocated, the audio face of the image decode-bomb
    * guard. */
  val MaxFrames: Long = 16L * 1024 * 1024

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_abs", LongType),
    StructField("zero_crossings", LongType)))

  def apply(payload: Column): Column =
    Bridge.column(AudioFeaturesExpr(Bridge.expression(payload)))
}

/** Deterministic WAV synthesis, scan-side (the audio analogue of
  * [[GrayPngExpr]]'s PNG synthesis): a 16-bit PCM mono 8 kHz square wave
  * of `nSamples` samples alternating ±`amp` every `period` samples,
  * wrapped in a standard RIFF/WAVE header. Every feature of the encoded
  * audio is a closed-form function of (period, amp, nSamples) — Σ|s| =
  * n·amp, zero crossings = ⌊(n−1)/period⌋ — so a decode contract can be
  * verified by an engine that cannot decode audio at all: the oracle
  * recomputes the formulas, the engine must actually parse the bytes to
  * reproduce them. */
case class PcmWavExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ImplicitCastInputTypes {

  // SQL integer literals arrive as whatever type the parser picked (BIGINT
  // from expressions, DECIMAL from fractional forms); declaring IntegerType
  // inputs makes the analyzer coerce them instead of nullSafeEval throwing.
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_wav"

  override def nullSafeEval(periodAny: Any, ampAny: Any, nAny: Any): Any = {
    val period = periodAny.asInstanceOf[Int]
    val amp = ampAny.asInstanceOf[Int]
    val n = nAny.asInstanceOf[Int]
    if (period <= 0 || amp <= 0 || amp > Short.MaxValue ||
      n < 0 || n > AudioFeaturesExpr.MaxFrames) null
    else {
      val dataSize = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)          // PCM, mono
        .putInt(8000).putInt(16000)       // sample rate, byte rate
        .putShort(2).putShort(16)         // block align, bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < n) {
        val s = if ((i / period) % 2 == 0) amp else -amp
        buf.putShort(s.toShort)
        i += 1
      }
      buf.array()
    }
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PcmWavExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PcmWavExpr {
  def apply(period: Column, amp: Column, nSamples: Column): Column =
    Bridge.column(PcmWavExpr(Bridge.expression(period),
      Bridge.expression(amp), Bridge.expression(nSamples)))
}
