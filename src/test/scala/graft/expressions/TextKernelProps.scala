package graft.expressions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the text kernels whose semantics are load-bearing for
  * the DuckDB oracles:
  *   1. tokenizeAscii must equal the regex reference
  *      `lower(s).split("[^a-z0-9]+")` minus empties on ARBITRARY input
  *      (including non-ASCII) — the graded shingle queries' oracle contract.
  *   2. the frame container must never throw on arbitrary bytes
  *      (corrupt media yields empty, not a dead task), and must round-trip
  *      arbitrary frame lists.
  */
object TextKernelProps extends Properties("TextKernels") {

  private val genText: Gen[String] = Gen.frequency(
    5 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', ',', '.', '-', '_', '!'),
      1 -> Gen.oneOf('é', 'Ü', 'ß', '中', 'ё', 'İ', '7', 'Z'))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.asciiPrintableStr)

  property("tokenizeAscii equals the oracle regex semantics on any input") =
    Prop.forAll(genText) { s =>
      val expected = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      TextKernels.tokenizeAscii(s).toSeq == expected
    }

  property("unpackFrames never throws on arbitrary bytes") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      graft.operators.Multimodal.MediaCodec.unpackFrames(arr)
      true
    }

  property("frame container round-trips arbitrary frame lists") =
    Prop.forAll(Gen.listOf(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)))) { frames =>
      val in = frames.map(_.toArray)
      val out = graft.operators.Multimodal.MediaCodec.unpackFrames(
        graft.operators.Multimodal.MediaCodec.packFrames(in))
      out.map(_.toSeq) == in.map(_.toSeq)
    }
}
