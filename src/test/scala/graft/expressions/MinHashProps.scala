package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** The estimator property LSH banding rests on: the fraction of agreeing
  * minhash components approximates the exact shingle-set Jaccard. The
  * kernel is deterministic, so for any generated document pair the
  * K = 256 estimate must sit within a fixed tolerance of the exact value
  * computed from the same kernel's shingle sets (binomial std-err at
  * K = 256 is ≤ 0.031, so |err| ≤ 0.15 is ≈ 5σ — a real estimator bug,
  * not sampling noise, is what would break it).
  */
object MinHashProps extends Properties("TextKernels.minhash") {

  private val K = 256

  private val genDocPair: Gen[(String, String)] = for {
    base <- Gen.listOfN(40, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa"))
    keep <- Gen.choose(0, 40)
    extra <- Gen.listOfN(12, Gen.oneOf("mu", "nu", "xi", "omicron", "pi", "rho"))
  } yield (base.mkString(" "), (base.take(keep) ++ extra).mkString(" "))

  private def exactJaccard(a: String, b: String): Double = {
    def set(s: String) = {
      val arr = TextKernels.shingleHashes(UTF8String.fromString(s), 2)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val (sa, sb) = (set(a), set(b))
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  private def estimate(a: String, b: String): Double = {
    val sa = TextKernels.minhashSignature(UTF8String.fromString(a), 2, K)
    val sb = TextKernels.minhashSignature(UTF8String.fromString(b), 2, K)
    (0 until K).count(i => sa.getLong(i) == sb.getLong(i)).toDouble / K
  }

  property("signature agreement estimates exact shingle Jaccard within 0.15") =
    Prop.forAll(genDocPair) { case (a, b) =>
      val (exact, est) = (exactJaccard(a, b), estimate(a, b))
      (math.abs(exact - est) <= 0.15) :|
        f"exact=$exact%.3f est=$est%.3f a='${a.take(30)}' b='${b.take(30)}'"
    }

  property("identical documents estimate 1.0; disjoint vocabularies near 0") =
    Prop.forAll(Gen.listOfN(20, Gen.oneOf("w1", "w2", "w3", "w4"))) { ws =>
      val doc = ws.mkString(" ")
      val disjoint = ws.map(_.toUpperCase + "q").mkString(" ")
      estimate(doc, doc) == 1.0 && estimate(doc, disjoint) <= 0.1
    }
}
