package graft.expressions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the string-metric kernels behind the DuckDB-native
  * oracles (q_name_similarity, q_edit_distances). The full (unrestricted)
  * Damerau-Levenshtein is a genuine METRIC — symmetry, identity, and the
  * triangle inequality all hold (the restricted/OSA variant breaks the
  * triangle inequality, so these properties double as a guard against
  * silently swapping in the cheaper algorithm). Jaro-Winkler is a
  * bounded symmetric similarity.
  */
object StringMetricProps extends Properties("StringMetrics") {

  private def u(s: String) = UTF8String.fromString(s)
  private def jw(a: String, b: String) = TextKernels.jaroWinkler(u(a), u(b))
  private def dl(a: String, b: String) = TextKernels.damerauLevenshtein(u(a), u(b))
  private def lev(a: String, b: String): Int = {
    // reference Wagner-Fischer, independent of the kernel under test
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val genS: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  property("damerau is symmetric with identity 0") = Prop.forAll(genS, genS) { (a, b) =>
    dl(a, b) == dl(b, a) && dl(a, a) == 0
  }

  property("damerau satisfies the triangle inequality (full variant, not OSA)") =
    Prop.forAll(genS, genS, genS) { (a, b, c) => dl(a, c) <= dl(a, b) + dl(b, c) }

  property("damerau is bounded by levenshtein and by max length") =
    Prop.forAll(genS, genS) { (a, b) =>
      val d = dl(a, b)
      d <= lev(a, b) && d <= math.max(a.length, b.length) &&
        d >= math.abs(a.length - b.length)
    }

  property("hamming bounds levenshtein on equal lengths") =
    Prop.forAll(genS) { a =>
      Prop.forAll(Gen.listOfN(a.length, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)) { b =>
        val h = TextKernels.hammingDistance(u(a), u(b))
        h >= 0 && lev(a, b) <= h && dl(a, b) <= h
      }
    }

  property("jaro-winkler is symmetric, in [0,1], and 1 iff equal (nonempty)") =
    Prop.forAll(genS, genS) { (a, b) =>
      val s = jw(a, b)
      val oneIffEqual =
        if (a.isEmpty || b.isEmpty) s == 0.0
        else (s == 1.0) == (a == b)
      s == jw(b, a) && s >= 0.0 && s <= 1.0 && oneIffEqual
    }
}
