package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom Catalyst expressions.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambdas interpreted, row by row — fine for occasional use,
  * hopeless in the inner loop of a similarity join over 10^8 vectors. These
  * static methods are called from generated code (see Expressions.scala), so
  * the surrounding plan stays inside whole-stage codegen and the per-element
  * work is a plain JVM loop the JIT vectorizes.
  */
object VectorKernels {

  /** Cosine similarity in ONE pass (dot + both norms fused). `aFloat` /
    * `bFloat` flag float vs double element storage.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Σ|aᵢ − bᵢ| over two BIGINT arrays — the codegen replacement for the
    * interpreted `aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, +)`
    * idiom, with EXACT parity on its edge semantics: zip_with null-pads
    * when lengths differ and a null element poisons the un-coalesced sum,
    * so this returns null (boxed) on length mismatch or any null element,
    * and the plain-Long accumulation elsewhere. One boxed Long per call;
    * the per-element loop stays primitive and JIT-vectorizable.
    */
  def l1Long(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += (if (d < 0) -d else d)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Σ aᵢ·bᵢ over two BIGINT arrays — codegen stand-in for the
    * interpreted `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)`
    * integer dot product (MaxSim late interaction). Same null/length
    * parity rules as [[l1Long]].
    */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Σ(aᵢ − bᵢ)² over two BIGINT arrays — codegen stand-in for the
    * interpreted `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +)`
    * squared-L2 idiom (k-means scoring, PQ encode). Same null/length
    * parity rules as [[l1Long]].
    */
  def l2sqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** PQ ADC lookup-sum: Σ_m dmap[m·kCode + codes[m]] — the codegen
    * replacement for the interpreted
    * `aggregate(sequence(0, nSub-1), 0L, (acc, m) ->
    *    acc + element_at(dmap, m * kCode + element_at(codes, m + 1)))`
    * serve idiom, with exact parity on its edge semantics: an
    * out-of-range codes index, a null code element, or a missing map
    * key (a vanished codeword) poisons the running sum to NULL — the
    * "loud NULL adist" contract the map layout exists for. The map
    * is built from `sort_array` output, so its key array is ascending
    * and dense in the no-vanished-codeword case; the direct-index
    * fast path hits then, with a linear scan fallback that is correct
    * under ANY key order.
    */
  def adcSum(
      codes: ArrayData,
      dmap: org.apache.spark.sql.catalyst.util.MapData,
      nSub: Int,
      kCode: Int): java.lang.Long = {
    if (nSub > codes.numElements()) return null
    val keys = dmap.keyArray()
    val vals = dmap.valueArray()
    val sz = keys.numElements()
    var acc = 0L
    var m = 0
    while (m < nSub) {
      if (codes.isNullAt(m)) return null
      val key = m.toLong * kCode + codes.getLong(m)
      var idx = -1
      if (key >= 0 && key < sz && keys.getLong(key.toInt) == key) idx = key.toInt
      else {
        var i = 0
        while (idx < 0 && i < sz) { if (keys.getLong(i) == key) idx = i; i += 1 }
        if (idx < 0) return null
      }
      if (vals.isNullAt(idx)) return null
      acc += vals.getLong(idx)
      m += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Index of the cosine-nearest centroid; ties break to the lowest index.
    * `centroids` is row-major (k × dim) with `norms(i)` the precomputed L2
    * norm of row i — shipped once as plan literals, so nearest-cell
    * assignment is a narrow per-row projection (no join, no shuffle).
    */
  def nearestCentroid(
      v: ArrayData,
      centroids: Array[Double],
      norms: Array[Double],
      dim: Int,
      vFloat: Boolean): Int = {
    val d = math.min(dim, v.numElements())
    val k = norms.length
    var vn = 0.0
    var i = 0
    while (i < d) {
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vn += x * x
      i += 1
    }
    val vnorm = math.sqrt(vn)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * dim
      var j = 0
      while (j < d) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * centroids(off + j)
        j += 1
      }
      val denom = vnorm * norms(c)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Splitmix64-derived pseudo-random double in [-1, 1) for plane `p`,
    * coordinate `i` — lets LSH bucketing work without knowing the vector
    * dimension at plan time (plane values are a pure function of
    * (seed, p, i), identical on every executor).
    */
  def planeValue(seed: Long, p: Int, i: Int): Double = {
    var z = seed + (p.toLong << 32) + i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Dimension-agnostic random-hyperplane LSH bucket: bit p = sign(v · plane_p)
    * with plane coordinates generated on the fly from (seed, p, i).
    */
  def hyperplaneBucketDyn(v: ArrayData, nPlanes: Int, seed: Long, vFloat: Boolean): Long = {
    val d = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * planeValue(seed, p, i)
        i += 1
      }
      if (acc >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Random-hyperplane LSH bucket id: bit i = sign(v · planes[i]). `planes`
    * is row-major (nPlanes × dim), shipped once as a plan literal.
    */
  def hyperplaneBucket(v: ArrayData, planes: Array[Double], dim: Int, vFloat: Boolean): Long = {
    val nPlanes = planes.length / dim
    val d = math.min(dim, v.numElements())
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      val off = p * dim
      while (i < d) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * planes(off + i)
        i += 1
      }
      if (acc >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Text kernels: tokenization + hashing in one pass per document. */
object TextKernels {

  /** FNV-1a 64-bit over UTF-8 bytes — fast, deterministic, dependency-free.
    * (Internal LSH hashing only; never compared against an external oracle.)
    */
  def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  def fnv64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fnv64(b, 0, b.length)
  }

  /** Accent stripping: NFD-decompose, drop combining marks (Unicode
    * categories Mn/Mc/Me — the set utf8proc's STRIPMARK removes),
    * NFC-recompose — the standard diacritic fold every
    * text-normalization pipeline runs before tokenizing. Iterates by
    * CODE POINT, so supplementary-plane marks (e.g. Adlam U+1E944) are
    * stripped too, never leaked as surrogate halves.
    *
    * Engine contract: NFD → drop marks → NFC. This agrees with DuckDB's
    * `strip_accents` wherever recomposition is a no-op after the marks
    * are gone — all Latin/Cyrillic/Greek accent folding, and exactly the
    * range q_text_normalize's oracle exercises. It intentionally does
    * NOT reproduce utf8proc's decompose-without-recompose tail (which
    * would leave Hangul as disassembled jamo — a worse engine contract);
    * an oracle over such scripts would need a rows-only check.
    *
    * The ASCII fast path returns the input UTF8String untouched (zero
    * allocation — the common case in a mostly-ASCII corpus costs one
    * byte scan).
    */
  def stripAccents(text: UTF8String): UTF8String = {
    val n = text.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((text.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return text
    val nfd = java.text.Normalizer.normalize(text.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Jaro-Winkler similarity (Winkler 1990) with the classic parameters
    * every mainstream implementation (including DuckDB's
    * `jaro_winkler_similarity`, which this kernel is oracle-checked
    * against) agrees on: match window floor(max(|a|,|b|)/2)-1,
    * transpositions = half the out-of-order matches, prefix boost only
    * when jaro > 0.7, prefix capped at 4, scaling p = 0.1, and 0.0 when
    * either side is empty (DuckDB scores even ''≡'' as 0). Operates on
    * UTF-16 code units — identical to DuckDB's byte-counted distance
    * family ONLY for ASCII input (one byte = one code unit). Non-ASCII
    * BMP text (accented names: 2-3 UTF-8 bytes but one code unit)
    * yields different distances than DuckDB; the oracles exercise the
    * ASCII p_name corpus, where the two coincide exactly. Callers
    * comparing against byte-counted references on non-ASCII text must
    * normalize both sides first.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val sMatch = new Array[Boolean](la)
    val tMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val trans = halfTrans / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** FULL Damerau-Levenshtein distance (Lowrance-Wagner 1975, the
    * alphabet-indexed DP) — adjacent transpositions cost 1 even with
    * edits between them (CA→ABC = 2), matching DuckDB's
    * `damerau_levenshtein` (which this kernel is oracle-checked
    * against), NOT the cheaper restricted/OSA variant (which would
    * score CA→ABC as 3). O(|a|·|b|) time and space; edit-distance
    * candidates at corpus scale should be pre-pruned (FuzzyJoin's
    * prefix signatures) before this exact verify.
    */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = Option(last.get(b.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  /** Hamming distance over UTF-16 code units; -1 when lengths differ
    * (DuckDB's `hamming` ERRORS on unequal lengths — callers guard with
    * a length-equality predicate, and -1 makes an unguarded call loud
    * in results rather than silently wrong).
    */
  def hammingDistance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    if (a.length != b.length) return -1
    var n = 0
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) n += 1; i += 1 }
    n
  }

  /** Lowercased runs of [a-z0-9] as an ArrayData of strings — the exact
    * semantics of `string_split_regex(lower(s), '[^a-z0-9]+')` minus
    * empties (shared with the DuckDB heavy-hitters oracle), as one codegen
    * pass instead of an interpreted filter() lambda over split().
    */
  /** Adjacent [a-z]{2} code-point bigrams of an (already-lowercased)
    * string in one codegen pass — exactly the bigrams the interpreted
    * `transform(sequence(1, len-1), i -> substring(t, i, 2))` +
    * `rlike("^[a-z]{2}$")` pipeline kept (substring counts CODE POINTS,
    * so adjacency here iterates code points too; a trailing 1-char
    * window or any pair touching a non-[a-z] code point never matched
    * the regex and is simply not emitted).
    */
  def asciiBigrams(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](s.length / 2 + 1)
    var prev = -1
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 'a' && prev <= 'z' && cp >= 'a' && cp <= 'z')
        out += UTF8String.fromString("" + prev.toChar + cp.toChar)
      prev = cp
      i += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray[Any])
  }

  def asciiTokens(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](s.length / 5 + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += UTF8String.fromString(sb.toString); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray[Any])
  }

  /** Code-point character-class census in ONE pass:
    * [n_alpha, n_digit, n_space, n_punct, n_other] with regex-definable
    * classes so a SQL oracle can replay each count independently —
    * alpha = [A-Za-z], digit = [0-9], space = [ \t\n\r\f],
    * punct = the ASCII punctuation blocks (0x21-0x2F, 0x3A-0x40,
    * 0x5B-0x60, 0x7B-0x7E), other = every remaining code point
    * (including all non-ASCII). Supplementary-plane code points count
    * ONCE (surrogate pairs are consumed pairwise), matching DuckDB's
    * code-point `length`. The quality-filter primitive: symbol-garbage
    * and OCR-noise ratios come straight off these counts.
    */
  def charClassCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    var alpha = 0L; var digit = 0L; var space = 0L; var punct = 0L; var other = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) alpha += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
        cp == '\f' || cp == 0x0B) space += 1
      else if ((cp >= 0x21 && cp <= 0x2F) || (cp >= 0x3A && cp <= 0x40) ||
        (cp >= 0x5B && cp <= 0x60) || (cp >= 0x7B && cp <= 0x7E)) punct += 1
      else other += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array[Long](alpha, digit, space, punct, other))
  }

  /** ASCII-alphanumeric lowercase tokens (runs of [a-z0-9] over the
    * ROOT-lowercased string) — the exact semantics of DuckDB's
    * `string_split_regex(lower(s), '[^a-z0-9]+')` minus empties. Oracle-
    * pinned queries shingle over THIS tokenizer so their DuckDB mirror
    * holds on any corpus, not just an ASCII one; [[tokenize]] below is the
    * Unicode-aware engine default.
    */
  def tokenizeAscii(s: String): Array[String] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[String](lower.length / 5 + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Lowercase word tokens (runs of letters/digits). */
  def tokenize(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length / 5 + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(Character.toLowerCase(c))
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Distinct hashed word-n-gram shingles, sorted ascending (so set ops are
    * linear merges). One row-major pass: tokenize, roll a window hash.
    * `ascii = true` switches to [[tokenizeAscii]] (oracle-equivalent
    * tokenization); the default stays Unicode-aware.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData =
    shingleHashes(text, n, ascii = false)

  def shingleHashes(text: UTF8String, n: Int, ascii: Boolean): ArrayData = {
    val tokens =
      if (ascii) tokenizeAscii(text.toString) else tokenize(text.toString)
    val m = math.max(tokens.length - n + 1, if (tokens.isEmpty) 0 else 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n && i + j < tokens.length) {
        val t = tokens(i + j)
        var k = 0
        while (k < t.length) { h ^= (t.charAt(k) & 0xffL); h *= 0x100000001b3L; k += 1 }
        h ^= ' ' & 0xffL; h *= 0x100000001b3L
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }

  /** Word-bigram repetition verdict in ONE kernel pass — the filter form
    * of TextAnalysis.bigramRepetition (same semantics: tokens are a plain
    * single-space split KEEPING empties, exactly DuckDB's
    * `string_split(text, ' ')`; repetitive ⇔ n_bigrams > 0 and
    * distinct·10 ≤ n_bigrams·8). A Column-DSL formulation of the same
    * verdict re-evaluates its lambda-built bigram array per reference —
    * higher-order functions are excluded from subexpression elimination,
    * and a filter pushed through the staging projection re-fuses it —
    * measured ~30x slower than this kernel on the documents corpus.
    */
  def bigramRepetitive(text: UTF8String): Boolean = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) false
    else {
      val nb = n - 1
      val set = new java.util.HashSet[String](nb * 4 / 3 + 1)
      var i = 0
      while (i < nb) { set.add(toks(i) + " " + toks(i + 1)); i += 1 }
      set.size * 10 <= nb * 8
    }
  }

  /** Exact intersection cardinality of two SORTED long arrays (linear
    * merge) — the integer numerator of Jaccard, for oracle outputs that
    * must avoid rounded ratios (see InterCountSorted).
    */
  def interCountSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Exact Jaccard of two SORTED long arrays via linear merge. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** K-minhash signature from the shingle hashes using Kirsch-Mitzenmacher
    * double hashing: g_i(x) = h1(x) + i·h2(x). One pass over shingles for
    * all K functions — no K string re-hashes like the HOF formulation.
    */
  def minhashSignature(text: UTF8String, n: Int, k: Int): ArrayData =
    minhashSignature(text, n, k, ascii = false)

  def minhashSignature(text: UTF8String, n: Int, k: Int, ascii: Boolean): ArrayData = {
    val sh = shingleHashes(text, n, ascii)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = sh.numElements()
    var i = 0
    while (i < m) {
      val h1 = sh.getLong(i)
      // second independent hash by remixing (splitmix64 finalizer)
      var h2 = h1 + 0x9E3779B97F4A7C15L
      h2 = (h2 ^ (h2 >>> 30)) * 0xBF58476D1CE4E5B9L
      h2 = (h2 ^ (h2 >>> 27)) * 0x94D049BB133111EBL
      h2 = h2 ^ (h2 >>> 31)
      var f = 0
      while (f < k) {
        val v = h1 + f.toLong * h2
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over word tokens (FNV token hash, ±1 bit votes). */
  def simhash64(text: UTF8String): Long = {
    val tokens = tokenize(text.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = fnv64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

/** Space-filling-curve kernels for the Layout operators. The Hilbert
  * mapping is the classic iterative bit algorithm (Hilbert 1891;
  * algorithmic form per Warren, Hacker's Delight §16 and the public
  * xy2d/d2xy formulation): reflections/rotations applied at each scale
  * `s`, giving a curve where consecutive indices are unit Manhattan
  * steps — strictly better range locality than the Morton/Z interleave
  * ([[graft.operators.Layout.zvalue2]]), at the cost of not being a
  * pure bit-shuffle.
  */
object CurveKernels {

  /** Hilbert index at order 16 (inputs clamped to [0, 65535]; output in
    * [0, 2^32)). Same fixed 16-bit domain contract as the z-order path:
    * callers pre-scale with a data-independent mapping.
    */
  def hilbertXY2D(xIn: Long, yIn: Long): Long = {
    var x = math.min(math.max(xIn, 0L), 65535L)
    var y = math.min(math.max(yIn, 0L), 65535L)
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant at scale s
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse mapping at arbitrary order — driver-side only (bucket
    * rectangle lookup); returns (x, y) of index `d` on the order-`order`
    * curve. Consistent with [[hilbertXY2D]]'s orientation, and with the
    * quadtree-prefix property the bucket pruning relies on: the top 2p
    * bits of an order-q index are the order-p index of the containing
    * cell.
    */
  def hilbertD2XY(order: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    val n = 1L << order
    while (s < n) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}
