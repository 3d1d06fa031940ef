package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, language-ID, quality scoring, fingerprinting.
  *
  * Everything here is a pure Catalyst expression composition (no UDFs)
  * so it stays inside whole-stage codegen and runs at scan speed — the
  * operators a 100 TB training-data pipeline applies to every document
  * exactly once must not leave the codegen'd hot path.
  *
  * The reference's text surface is FTS tokenization + keyword search
  * (generate_note_embeddings.py:49); these extend it with the standard
  * corpus-curation operators (quality/lang/fingerprint) that engine
  * users run before indexing.
  */
object TextFunctions {

  /** Lowercased alnum word tokens. Same pattern on the DuckDB oracle
    * side (`regexp_extract_all`), so results are engine-portable.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish subword segmentation: letter runs, single digits, and
    * single non-alnum marks — a deterministic approximation of
    * byte-pair tokenizer granularity for cost estimation.
    */
  def subTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))

  /** Language-specific stopword inventories (tiny, deterministic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein")
  )

  /** Occurrences of any `set` member as a WHOLE TOKEN of `text`
    * (with multiplicity), counted directly on the string. A token is
    * a maximal [a-z0-9]+ run of lower(text), so a set word matches
    * exactly where the tokenized array would hold it:
    * `(?<![a-z0-9])(w1|w2|…)(?![a-z0-9])` — the lookarounds force
    * whole-token matches regardless of alternation order, and
    * full-token matches cannot overlap, so the non-overlapping scan
    * counts precisely the array-filter hits.
    *
    * r19 rewrite (opt guide §1.2 per-task work): the previous
    * `size(filter(toks, array_contains(…)))` evaluated an INTERPRETED
    * lambda per row and forced the tokens array to materialize just
    * to be counted; `regexp_count` is one codegen'd pass over the
    * text. (An older measured note rejected the per-word
    * size(array_remove) expansion as 4× worse than the HOF — this
    * replaces the HOF with zero array work instead. Measured on the
    * d12 quality filter at sf0.1: see OPTIMIZATION_r19.md.)
    */
  def hitCount(text: Column, set: Seq[String]): Column =
    regexp_count(lower(text),
      lit(s"(?<![a-z0-9])(${set.mkString("|")})(?![a-z0-9])"))

  /** Token count straight off the text — `size(tokens(text))` without
    * materializing the array (same [a-z0-9]+ runs).
    */
  def tokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+"))

  /** Stopword-profile language ID over the RAW TEXT column.
    * Deterministic argmax with fixed priority order en > es > fr > de;
    * 'und' when no stopword hits. A real n-gram model slots in behind
    * the same Column signature.
    */
  def langId(text: Column): Column = {
    val en = hitCount(text, stopwords("en"))
    val es = hitCount(text, stopwords("es"))
    val fr = hitCount(text, stopwords("fr"))
    val de = hitCount(text, stopwords("de"))
    when(en + es + fr + de === 0, lit("und"))
      .when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  /** Heuristic quality features: length, punctuation ratio, stopword
    * ratio. Ratios are single IEEE divisions of exact ints — bitwise
    * identical across engines.
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") /
      length(text).cast("double")

  def stopwordRatio(text: Column): Column =
    hitCount(text, stopwords("en")).cast("double") /
      tokenCount(text).cast("double")

  /** Quality bucket from the features (threshold CASE — same tree on
    * the oracle side).
    */
  def qualityBucket(nToks: Column, punct: Column, stop: Column): Column =
    when(nToks < 10, lit("too_short"))
      .when(punct > 0.1, lit("noisy"))
      .when(stop < 0.01, lit("unnatural"))
      .otherwise(lit("ok"))

  /** Winnowing-style document fingerprint: minimum md5 over all k-char
    * shingles of the normalized text. Shared shingles ⇒ shared minima,
    * so near-identical docs collide; portable because md5 hex strings
    * order identically everywhere.
    */
  def fingerprint(text: Column, k: Int = 8): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val idx = sequence(lit(1), greatest(length(norm) - (k - 1), lit(1)))
    array_min(transform(idx, i => md5(norm.substr(i, lit(k)).cast("binary"))))
  }

  /** Exact-dup content key: md5 of whitespace-normalized lowercase text. */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  /** Adjacent word-token bigrams ("w1 w2") — the unit of the
    * repetition-quality signals (Gopher-style duplicate-n-gram
    * filters) and of corpus-wide vocabulary counting. Empty array for
    * docs with fewer than two tokens (a `sequence(1, 0)` would flip
    * into a descending range, so the guard is load-bearing).
    * `element_at` is 1-based.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Codegen-friendly EXPLODED bigrams (r19) — the postings() idiom
    * applied to the bigram hot paths (t6/t9/NgramLm): explode a
    * 1-based position sequence and build each bigram with
    * element_at + concat_ws, all ordinary codegen'd expressions,
    * instead of explode([[bigrams]]) whose `transform` lambda
    * evaluates INTERPRETED per element (opt guide §1.2 per-task
    * work). Callers filter `size(toks) >= 2` first (sequence(1, 0)
    * is DESCENDING, not empty) — explode-of-empty drops those rows in
    * the HOF form, the filter drops them here; identical rows out.
    */
  def bigramPositions(toks: Column): Column =
    sequence(lit(1), size(toks) - 1)

  /** The bigram starting at 1-based position `p` of `toks`. */
  def bigramAt(toks: Column, p: Column): Column =
    concat_ws(" ", element_at(toks, p), element_at(toks, p + 1))

  /** Overlapping character windows for RAG/embedding ingestion: an
    * array of (chunk_id, start, chunk) structs, windows of `win`
    * chars every `stride` chars (overlap = win − stride). Chunk count
    * is `1 + ceil(max(len − win, 0) / stride)` — one chunk always
    * (even for empty text), and the last chunk starts within the
    * text. Pure per-row expression arithmetic: chunking a 100 TB
    * corpus is a map-only pass, and the downstream embed/index stages
    * see (doc_id, chunk_id) keys that partition freely. `start` is
    * 1-based (substring convention shared with the SQL oracles).
    */
  def chunkWindows(text: Column, win: Int, stride: Int): Column = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    val nChunks = (lit(1) +
      floor((greatest(length(text) - win, lit(0)) + lit(stride - 1)) /
        lit(stride))).cast("int")
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.as("chunk_id"), (i * stride + 1).as("start"),
        text.substr(i * stride + 1, lit(win)).as("chunk")))
  }
}
