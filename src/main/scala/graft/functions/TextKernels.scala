package graft.functions

/** Pure text-analysis kernels for the training-data-pipeline operators
  * (dedup, language ID, quality scoring, fingerprinting). All hashes are
  * deterministic (no wall-clock, no JVM hashCode of objects) so results
  * hash-match across runs and across executors.
  *
  * Used inside UDFs / typed maps; the corresponding relational operators
  * in graft.operators prefer built-in `functions._` columns wherever the
  * semantics are expressible (SURVEY.md §7.1).
  */
object TextKernels {

  /** Whitespace tokenizer: splits on runs of whitespace, drops empties. */
  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.trim.split("\\s+").filter(_.nonEmpty)

  /** BPE-ish subword count heuristic: whitespace tokens plus an extra
    * token per 4 chars of overlong words (approximates byte-pair token
    * inflation on long words without a vocab).
    */
  def approxTokenCount(text: String): Long = {
    val toks = tokenize(text)
    toks.map(t => 1L + (if (t.length > 4) (t.length - 1) / 4 else 0)).sum
  }

  /** Deterministic 64-bit polynomial rolling hash of a string (base-31,
    * unsigned-wrap). Stable across JVMs — used for shingles, minhash,
    * simhash, and document fingerprints.
    */
  def hash64(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** Word k-shingles of a document (the unit set for Jaccard/minhash). */
  def shingles(text: String, k: Int): Set[String] = {
    val toks = tokenize(text)
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  /** Sorted hash64 values of the distinct word k-shingles — the q46
    * posting-index row shape. Set semantics apply to the shingle
    * STRINGS (a ~2⁻⁶⁴ hash collision between distinct shingles keeps
    * both longs, matching `shingles(..).map(hash64)` exactly); the
    * ascending sort is part of the contract (prefix slicing and the
    * sorted-merge verify both require it). Static so codegen call
    * sites ([[graft.plans.ShingleHashes]]) invoke it without a
    * ScalaUDF boundary.
    */
  def sortedShingleHashes(text: String, k: Int): Array[Long] = {
    val sh = shingles(text, k)
    val out = new Array[Long](sh.size)
    var i = 0
    sh.foreach { s => out(i) = hash64(s); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Position-ordered hash64 of EVERY word k-shingle — one element per
    * start position, duplicates kept, index == 0-based token position.
    * The anchor stream for exact duplicated-span mining (q83), where
    * [[sortedShingleHashes]]'s set semantics would erase the positions
    * the diagonal/island merge needs. Docs shorter than k tokens emit
    * the single whole-doc shingle, mirroring [[shingles]]. Static so
    * the codegen call site ([[graft.plans.ShingleHashesPos]]) invokes
    * it without a ScalaUDF boundary.
    */
  def positionalShingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) Array(hash64(toks.mkString(" ")))
    else {
      val n = toks.length - k + 1
      val out = new Array[Long](n)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = hash64(sb.toString)
        i += 1
      }
      out
    }
  }

  /** Exact Jaccard similarity of two shingle sets. */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size
      val union = a.size + b.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }
  }

  /** splitmix64 finalizer — the per-slot mixer that makes the minhash
    * "permutations" behave independently. (Plain double-hashing
    * h1 + i*h2 is NOT min-wise independent: a single element dominates
    * the argmin across slots and the estimator quantizes badly —
    * observed worst-case error 0.46 vs 0.08 with mixing.)
    */
  def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature of a shingle set: slot i applies mix64 to the
    * element hash offset by i golden-ratio steps. Deterministic.
    */
  def minhash(sh: Set[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    for (s <- sh) {
      val h1 = hash64(s)
      var i = 0
      while (i < numHashes) {
        val h = mix64(h1 + i * 0x9E3779B97F4A7C15L)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Fused text → minhash → LSH band keys (the q42 signature row) in
    * one static call, so codegen call sites
    * ([[graft.plans.MinhashBands]]) invoke the whole per-row map
    * without a ScalaUDF boundary. Identical to
    * `lshBands(minhash(shingles(text, k), numHashes), rowsPerBand)`.
    */
  def minhashBands(text: String, k: Int, numHashes: Int,
      rowsPerBand: Int): Array[Long] =
    lshBands(minhash(shingles(text, k), numHashes), rowsPerBand)

  /** Fused text → raw minhash signature (no banding) — the estimator
    * form: component-wise match fraction between two signatures is the
    * unbiased MinHash estimate of the texts' shingle-set Jaccard.
    * Identical slots to [[minhashBands]]'s input (q97 calibrates the
    * very signatures q42's LSH banding is built from).
    */
  def minhashSig(text: String, k: Int, numHashes: Int): Array[Long] =
    minhash(shingles(text, k), numHashes)

  /** LSH band keys of a minhash signature: hash each band of `rowsPerBand`
    * consecutive signature slots; docs sharing any band key are candidate
    * near-duplicates (join on (bandIdx, bandHash)).
    */
  def lshBands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    sig.grouped(rowsPerBand).zipWithIndex.map { case (band, i) =>
      var h = 1125899906842597L + i
      for (v <- band) h = 31 * h + v
      h
    }.toArray
  }

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes. Hamming-close simhashes ⇒ similar documents. mix64 matters
    * here: raw base-31 polynomial hashes have biased HIGH bits, which
    * skews the top LSH band into one giant bucket (measured: a 695-doc
    * bucket → 568 k candidate pairs on 5 k docs; mixed, the worst band
    * yields < 1 k).
    */
  def simhash(text: String, k: Int = 2): Long = {
    val counts = new Array[Int](64)
    for (s <- shingles(text, k)) {
      val h = mix64(hash64(s))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling-hash document fingerprint: min of window hashes (winnowing-
    * lite). Two documents sharing long runs share fingerprints.
    */
  def fingerprint(text: String, window: Int = 8): Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) 0L
    else if (toks.length <= window) hash64(toks.mkString(" "))
    else toks.sliding(window).map(w => hash64(w.mkString(" "))).min
  }

  /** Tiny stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Public common-word lists; intentionally minimal.
    */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Set("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"),
    "zh" -> Set.empty)

  /** Language-ID heuristic: score = fraction of tokens in each language's
    * stopword list; CJK codepoint ratio shortcuts to zh. Returns the
    * argmax language or "und" when nothing scores.
    */
  def languageId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints.toArray.count(cp =>
      Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN)
    if (cjk * 4 >= text.length) return "zh"
    val toks = tokenize(text.toLowerCase).toSeq
    if (toks.isEmpty) return "und"
    val scores = stopwords.collect { case (lang, sw) if sw.nonEmpty =>
      lang -> toks.count(sw.contains).toDouble / toks.length
    }
    val (best, score) = scores.maxBy { case (l, s) => (s, l) }
    if (score <= 0.0) "und" else best
  }

  /** Quality score in [0,1]: blends length band, alpha ratio, punct
    * ratio, mean word length band, and repetition (distinct-token ratio).
    * Deterministic, cheap, order-free.
    */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    val n = text.length.toDouble
    val alpha = text.count(_.isLetter) / n
    val punct = text.count(c => !c.isLetterOrDigit && !c.isWhitespace) / n
    val meanWord = toks.map(_.length).sum.toDouble / toks.length
    val distinctRatio = toks.distinct.length.toDouble / toks.length
    val lengthOk = if (toks.length >= 10 && toks.length <= 10000) 1.0
      else if (toks.length >= 3) 0.5 else 0.1
    val wordOk = if (meanWord >= 3 && meanWord <= 12) 1.0 else 0.5
    val punctOk = if (punct <= 0.2) 1.0 else math.max(0.0, 1.0 - punct)
    0.25 * lengthOk + 0.2 * alpha + 0.15 * punctOk + 0.15 * wordOk +
      0.25 * distinctRatio
  }
}
