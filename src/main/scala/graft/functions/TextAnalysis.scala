package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for a training-data pipeline over `documents`:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All builtin-composed (codegen'd), no UDFs; each has an
  * exact DuckDB mirror for the oracle gate.
  */
object TextAnalysis {

  /** Whitespace tokens. `trim` first so leading/trailing whitespace doesn't
    * produce empty tokens (DuckDB mirror: `string_split_regex(trim(x),'\s+')`).
    */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish tokens: runs of letters, runs of digits, or single other
    * non-space chars — the classic pre-tokenizer shape. Pattern is shared
    * verbatim with the oracle (simple enough to mean the same in Java regex
    * and RE2).
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(BpeTokenPattern), lit(0))

  /** Distinct whitespace tokens — the set used for Jaccard/minhash. */
  def tokenSet(c: Column): Column = array_distinct(wsTokens(c))

  /** Sorted distinct 60-bit token hashes — the fixed-width form of the token
    * set. Set operations over `array<long>` beat `array<string>` by a wide
    * margin (no string hashing/boxing); sortedness enables the two-pointer
    * [[SortedIntersectCount]]. md5-collision merges are identical in any
    * engine computing the same formula, so oracle parity holds.
    */
  def hashedTokenSet(c: Column): Column =
    sort_array(array_distinct(transform(tokenSet(c), t => Hashing.hash64(t))))

  /** Character n-gram shingles (distinct, sorted for stable downstream set
    * ops) — the canonical minhash input for near-dup detection when
    * whitespace tokenization is unreliable (code, CJK, mangled text).
    * Pure projection: `sequence` + `transform` + `substring`, no UDF.
    * DuckDB mirror: `list_transform(range(1, len-n+2), i -> substr(text,i,n))`.
    */
  def charShingles(c: Column, n: Int): Column =
    array_sort(
      array_distinct(
        transform(
          sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
          i => c.substr(i, lit(n)),
        )
      )
    )

  /** Hashes of overlapping word n-grams, in token order (source tokens NOT
    * deduplicated — position matters for contamination checks). Documents
    * shorter than `n` tokens yield an empty array; the `size >= n` guard is
    * required because Spark's `sequence(a, b)` DESCENDS when a > b.
    * DuckDB mirror: `list_transform(range(1, len(toks)-n+2),
    * i -> hash64(array_to_string(toks[i:i+n-1], ' ')))` (range is
    * end-exclusive and empty when the end is below the start).
    */
  def wordNgramHashes(c: Column, n: Int): Column = wordNgramHashesFromTokens(wsTokens(c), n)

  /** [[wordNgramHashes]] over a pre-tokenized array column. Callers MUST pass
    * an attribute (a column hoisted with `withColumn`), not the tokenizing
    * expression inline: `toks` occurs in the size guard, the sequence bound,
    * and the transform lambda, and Catalyst inlines shared subtrees into each
    * occurrence (the same blowup the minhash/simhash aggregates hit —
    * [[graft.operators.Dedup.withMinhash]]), so an inline `split` re-runs per
    * n-gram position: O(tokens²) string-splitting per document.
    */
  def wordNgramHashesFromTokens(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => Hashing.hash64(array_join(slice(toks, i, lit(n)), " ")),
      ),
    ).otherwise(array().cast("array<bigint>"))

  /** Stopword lists for the n-gram-heuristic language ID. Tiny on purpose:
    * language ID at 100 TB must stay a projection; these lists broadcast as
    * literals inside the plan.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men"),
  )

  /** Per-language stopword hit count over the token array. */
  def stopwordHits(tokens: Column, lang: String): Column = {
    val words = Stopwords.toMap.apply(lang)
    size(filter(tokens, t => words.map(w => t === w).reduce(_ || _)))
  }

  /** Language ID: argmax of stopword hits, ties broken alphabetically,
    * zero hits → "und" (undetermined). Pure projection.
    */
  def langId(tokens: Column): Column = {
    val langs = Stopwords.map(_._1).sorted
    val hits = langs.map(l => l -> stopwordHits(tokens, l))
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality-score features + composite (length, punctuation density, word
    * shape). Ratios are int/int double divisions — bit-identical across
    * engines.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val toks = wsTokens(text)
    val nTokens = size(toks)
    val nPunct = size(bpeTokens(text)) - size(filter(bpeTokens(text), t => t.rlike("^[A-Za-z0-9]+$")))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "avg_token_len" -> (nChars - (nTokens - 1)).cast("double") / nTokens,
      "punct_ratio" -> nPunct.cast("double") / greatest(nChars, lit(1)),
      "stopword_ratio" -> stopwordHits(toks, "en").cast("double") / greatest(nTokens, lit(1)),
    )
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs with low
    * punctuation density and some stopwords (the usual boilerplate/garbage
    * separators).
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = least(f("n_chars").cast("double") / 500.0, lit(1.0))
    lenScore * (lit(1.0) - f("punct_ratio")) * (lit(0.5) + f("stopword_ratio"))
  }

  /** PII patterns for detect/redact — deliberately simple enough to mean the
    * same thing in Java regex (Spark) and RE2 (DuckDB oracle): no lookaround,
    * no backreferences, ASCII classes only.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhonePattern = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Number of matches of `pattern` in `c` — a projection
    * (`regexp_extract_all` + `size`), used for PII hit counting.
    */
  def patternCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact all PII matches, emails first (their domains contain dots the
    * IPv4 pattern must not see), then IPs, then phones. Fixed order so both
    * engines rewrite identically. Spark `regexp_replace` is global, matching
    * the oracle's `'g'` flag.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern,
        "<IP>",
      ),
      PhonePattern,
      "<PHONE>",
    )

  /** Fraction of array positions occupied by a repeated value:
    * `(size - size(distinct)) / size`, 0 for empty arrays — the Gopher-style
    * repetition signal over raw token lists or in-order n-gram hashes.
    * CONTRACT: pass an ATTRIBUTE (hoist the array with `withColumn`), not an
    * expression — `arr` occurs three times and Catalyst inlines shared
    * non-attribute subtrees per occurrence ([[wordNgramHashesFromTokens]]).
    */
  def dupFraction(arr: Column): Column =
    when(size(arr) > 0, (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))
      .otherwise(lit(0.0))

  /** Polynomial rolling-hash document fingerprint:
    * `h = fold(chars)(h * 31 + ascii(c)) mod (2^31-1)`. Each step keeps the
    * accumulator < 2^31 so `h*31 + c` never overflows a long. DuckDB mirror:
    * `list_reduce` over `string_split(text,'')`.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % Hashing.P,
    )
}
