package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** TextKernels.charClassCounts properties: the census CLOSES (the five
  * class counts sum to the code-point length) and each class agrees
  * with an independent per-code-point reference — over random strings
  * spanning ASCII, Latin-1, CJK, and supplementary-plane emoji
  * (surrogate pairs must count once, like DuckDB's length).
  */
object CharClassProps extends Properties("TextKernels.charClassCounts") {

  private val genChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\t", "\n", "\r", "\f", "\u000B"),
    2 -> Gen.oneOf("!", ",", ".", ":", "@", "[", "`", "{", "~", "/"),
    2 -> Gen.oneOf("é", "ß", "中", "文", "λ", "д"),
    1 -> Gen.oneOf("😀", "𐀀", "🎉")) // supplementary plane
  private val genText: Gen[String] =
    Gen.listOf(genChar).map(_.mkString)

  private def refCounts(s: String): Array[Long] = {
    val c = new Array[Long](5)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val idx =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 0
        else if (cp >= '0' && cp <= '9') 1
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
          cp == '\f' || cp == 0x0B) 2
        else if ((cp >= 0x21 && cp <= 0x2F) || (cp >= 0x3A && cp <= 0x40) ||
          (cp >= 0x5B && cp <= 0x60) || (cp >= 0x7B && cp <= 0x7E)) 3
        else 4
      c(idx) += 1
      i += Character.charCount(cp)
    }
    c
  }

  property("census closes to code-point length and matches the reference") =
    Prop.forAll(genText) { s =>
      val got = TextKernels.charClassCounts(UTF8String.fromString(s))
      val arr = (0 until 5).map(got.getLong).toArray
      val ref = refCounts(s)
      val cpLen = s.codePointCount(0, s.length).toLong
      (arr.sameElements(ref) :| s"counts ${arr.toSeq} vs ref ${ref.toSeq}") &&
        (arr.sum == cpLen) :| s"census ${arr.sum} != cp length $cpLen"
    }
}
