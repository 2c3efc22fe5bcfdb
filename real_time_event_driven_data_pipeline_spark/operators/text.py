"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation is built-in Catalyst expressions (split /
transform / filter / aggregate over arrays) — JVM-side, codegen'd, no
Python in the loop — so these run at 100 TB the same way the KPI
queries do.  Determinism contract (shared with the DuckDB oracles):
ratios are emitted as raw int/int double divisions (correctly-rounded
IEEE, identical bits in any engine) — never round(double) which is
engine-dependent at half boundaries.

Operators:
- ``with_tokens``       whitespace tokenization
- ``text_stats``        token/char counts, avg token length, ratios
- ``language_id``       stopword-hit argmax heuristic
- ``fingerprint``       md5 of normalized text (exact-dup key)
- ``token_count_bpe``   BPE-ish subword count via regex
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order = deterministic tie-break precedence.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "den"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}

# BPE-ish subword pieces: word chunks of <=4 chars, digits, punctuation.
# Identical regex semantics in Java (Spark) and DuckDB's RE2 for this
# simple class-based pattern.
BPE_ISH_PATTERN = "[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]"


def tokens_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), "\\s+")


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_expr(text_col))


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features: counts, lengths, ratios.

    Output ratios are raw double divisions of exact integers
    (deterministic cross-engine; see module docstring).
    """
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z]", ""))
    ).cast("long")
    n_stopword_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS["en"]))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (sum_tok_len / n_tokens).alias("avg_token_len"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        (n_stopword_hits / n_tokens).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit argmax with deterministic precedence (STOPWORDS order).

    A classic n-gram/stopword language heuristic; emits per-language hit
    counts alongside the prediction so downstream filters can threshold.
    """
    toks = F.transform(tokens_expr(text_col), F.lower)
    hit_cols = {
        lang: F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")
        for lang, words in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    pred = F.lit("und")
    # build CASE from lowest precedence upward so earlier langs win ties
    for lang in reversed(langs):
        cond = (hit_cols[lang] > 0)
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (hit_cols[lang] > hit_cols[other])
            elif other != lang:
                cond = cond & (hit_cols[lang] >= hit_cols[other])
        pred = F.when(cond, lang).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )
    return out


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text.  The exact-dedup key (md5 is identical everywhere)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select(F.col(id_col), F.md5(normalized).alias("fp"))


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.01,
    max_stopword_ratio: float = 0.60,
) -> DataFrame:
    """Training-data quality gate: keep documents passing the classic
    length / alpha-ratio / stopword-ratio thresholds (the C4/Gopher-style
    rule family).  Pure composition of ``text_stats`` + filter: one scan,
    all JVM-side; comparisons are on exact int/int ratios so the same
    thresholds reproduce identically in any engine.
    """
    stats = text_stats(df, id_col, text_col)
    keep = stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def token_count_bpe(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Subword-ish token count: words split into <=4-char pieces, digits
    and punctuation as single tokens (a cheap BPE proxy for budgeting)."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.size(tokens_expr(text_col)).cast("long").alias("n_ws_tokens"),
    )


# --- PII scrubbing (training-data redaction pass) ---
# Sequential replace: emails first (their local parts can contain
# digits), then IPs (more specific than phones), then phone-ish digit
# runs.  Counts are taken stepwise on the text as-of each step so the
# three counters partition the redactions (no double counting).  All
# three patterns are valid in both Java regex (Spark) and RE2 (DuckDB
# oracle).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d() -]{7,}\d"


def scrub_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-like digit runs.

    Output: (id, clean_text, n_emails, n_ips, n_phones).  Pure JVM
    regexp expressions — codegen'd, no Python in the path.
    """
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL), 0))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IP), 0))
    t2 = F.regexp_replace(t1, PII_IP, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE), 0))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        t3.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


# --- deterministic hash split (train/val/test assignment) ---
# Fixed-width lowercase hex sorts lexicographically in numeric order,
# so thresholding the first two md5 hex chars gives engine-identical
# buckets with no hex->int conversion: 'cd' = 205/256 ~ 80% train,
# 'e6' = 230/256 ~ 10% val, rest test.  Keyed on the stable doc id —
# re-runs and re-shards never move a document across splits (the
# property random() splits lack).


def train_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.select(
        F.col(id_col),
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test").alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (corpus mixing weights).

    The training-mix step: keep stratum s at ``rates[s]`` (0..1).  The
    keep decision is the same md5-hex threshold as ``train_split`` (a
    pure function of the stable doc id + stratum), so re-runs, re-shards
    and incremental arrivals sample consistently — a row once kept is
    kept forever, which random ``sampleBy`` cannot promise.  Thresholds
    are expressed at 1/65536 granularity via the first 4 hex chars;
    a rate >= 1.0 keeps the stratum unconditionally (no hash test, so
    it is exactly keep-all rather than 65535/65536).
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)

    def keep(r):
        if r >= 1.0:
            return F.lit(True)
        cut = format(min(65535, int(round(r * 65536))), "04x")
        return h < cut

    expr = None
    for s, r in rates.items():
        cond = (F.col(strata_col) == s) & keep(r)
        expr = cond if expr is None else (expr | cond)
    if default_rate > 0:
        other = ~F.col(strata_col).isin(*rates) & keep(default_rate)
        expr = other if expr is None else (expr | other)
    return df.filter(expr if expr is not None else F.lit(False))


def hashed_embedding_weights(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing ("hashing trick") document vectors, sparse form.

    The text -> vector step of the curation pipeline without any model:
    every token hashes to a bucket in [0, dim) with a +/-1 sign, and the
    document's vector is the per-bucket signed token counts.  Signed
    hashing makes bucket collisions cancel in expectation, so cosine on
    these vectors approximates bag-of-words cosine (Weinberger et al.,
    "Feature Hashing for Large Scale Multitask Learning").

    Deterministic and engine-portable: bucket = first 4 md5 hex chars
    mod dim, sign = parity of the 5th — the same md5-hex convention as
    ``train_split``/``stratified_sample``, mirrored exactly by the
    DuckDB oracle.  Output: (id, bucket int, weight long), one row per
    non-zero bucket — one explode + one shuffle on (id, bucket), all
    built-in expressions.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
    h = F.md5(F.col("tok"))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % dim).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("long").alias("weight"))
    )


def hashed_embeddings(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dense ``array<double>`` variant of ``hashed_embedding_weights``,
    shaped for the similarity operators (ANN top-k, semantic dedup):
    (id, embedding array<double> of length ``dim``).

    Embedding is embarrassingly parallel, so this is SHUFFLE-FREE: the
    whole vector is a per-row array expression (token buckets/signs
    materialized into columns first — the with_shingles rule — then a
    per-dimension signed count via zip_with + aggregate).  O(dim x
    n_tokens) work per row, zero exchanges in the plan."""
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))

    def _bucket(t: Column) -> Column:
        return (F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long") % dim).cast("int")

    def _sign(t: Column) -> Column:
        return F.when(
            F.conv(F.substring(F.md5(t), 5, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
        ).otherwise(F.lit(-1))

    hashed = toked.select(
        F.col(id_col),
        F.transform("_toks", _bucket).alias("_bs"),
        F.transform("_toks", _sign).alias("_ss"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.zip_with("_bs", "_ss", lambda b, s: F.when(b == i, s).otherwise(0)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double"),
    )
    return hashed.select(F.col(id_col), vec.alias("embedding"))


def doc_chunks(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window chunking with overlap (context-window preparation).

    Splits each document into windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap``; the final short
    window is kept (its tokens would otherwise be lost to the trainer).
    Pure Catalyst array expressions — sequence + transform + slice +
    posexplode — so chunking scales with the corpus scan and never
    leaves the JVM.

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text), chunk_idx
    0-based in document order.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    # tokens materialized into a column BEFORE the window lambdas —
    # referencing the raw split() expression inside a lambda re-tokenizes
    # the document once per chunk (the with_shingles lesson, dedup.py)
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    n = F.size("_toks")
    # 1-based start positions 1, 1+step, ... <= n (n=0 -> no chunks);
    # a start s > 1 with s + overlap > n adds no new tokens (the
    # previous window already covers s..n, which is pure overlap) — drop
    # it so the final short chunk exists exactly when it carries content
    starts = F.filter(
        F.when(n > 0, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        ),
        lambda s: (s == 1) | (s + overlap <= n),
    )
    chunks = F.transform(starts, lambda s: F.slice("_toks", s, chunk_tokens))
    return (
        toked.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "ctoks"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("ctoks").cast("long").alias("n_chunk_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher repetition rules):
    documents dominated by repeated lines or a single repeated phrase
    are boilerplate/spam, invisible to length/stopword gates.

    - dup_line_ratio: 1 - distinct(lines)/count(lines) over newline
      splits (0 for single-line docs);
    - top_bigram_ratio: occurrences of the most frequent token bigram
      over total bigrams (0 when < 2 tokens; ratio of exact ints).

    Pure Catalyst array expressions; one scan, no shuffle, no Python.
    Arrays are materialized into columns before the lambdas (the
    with_shingles lesson — inlined expressions re-evaluate per element),
    and the max bigram multiplicity is a longest-equal-run fold over the
    SORTED bigram array: O(n log n) per doc, not O(distinct * n).
    """
    staged = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("_lines"),
        tokens_expr(text_col).alias("_toks"),
    )
    n_lines = F.size("_lines").cast("long")
    n_distinct_lines = F.size(F.array_distinct("_lines")).cast("long")

    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select(id_col, "_lines", F.array_sort(bigrams).alias("_bg"))
    n_bigrams = F.size("_bg").cast("long")
    zero = F.lit(0).cast("long")
    run_len = lambda acc, x: (  # noqa: E731
        F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
    )
    top_count = F.aggregate(
        F.col("_bg"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_len(acc, x).alias("run"),
            F.greatest(acc.best, run_len(acc, x)).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return staged.select(
        F.col(id_col),
        (1 - n_distinct_lines / n_lines).alias("dup_line_ratio"),
        F.when(n_bigrams > 0, top_count / n_bigrams)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-token shingle, slide a window of ``window`` hashes,
    keep the minimum of each window — the classic rolling-hash selection
    guaranteeing any shared run of ~k+window tokens between two
    documents shares at least one fingerprint (partial-overlap
    detection, e.g. quote/boilerplate reuse, where whole-doc md5 and
    Jaccard-over-all-shingles are too coarse).

    The "hash" is the md5 hex of the shingle and the window minimum is
    lexicographic — bit-identical in any engine, so the output is
    oracle-exact.  Emits (id, fp) rows, distinct per document; pure
    Catalyst array expressions, one scan, no shuffle, no Python.  Both
    the token and gram arrays are materialized into columns before the
    lambdas that index them (the with_shingles lesson, dedup.py) — the
    inlined-expression version re-tokenized per shingle and re-hashed
    per window, turning a linear scan quadratic.
    """
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    n = F.size("_toks")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(F.array_join(F.slice("_toks", i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grammed = toked.select(F.col(id_col), grams.alias("_grams"))
    m = F.size("_grams")
    fps = F.when(
        m >= window,
        F.transform(
            F.sequence(F.lit(1), m - (window - 1)),
            lambda i: F.array_min(F.slice("_grams", i, window)),
        ),
    ).otherwise(F.col("_grams"))  # short docs: every shingle hash is a fp
    return grammed.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fp")
    )


# --- deterministic global shuffle (training-order assignment) ---


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random training order: every doc gets a
    ``(shard, pos)`` such that reading shards in order and rows by
    ``pos`` within each shard yields a fixed hash-permutation of the
    corpus — the "global shuffle" step before training, without any
    RNG state (re-runs, re-shards and resumed jobs agree).

    shard = first 8 md5-hex chars of a salted id mod ``n_shards``
    (the ``train_split`` hex convention, widened to 32 bits so shard
    counts up to ~4e9 stay uniform); pos = rank of the full md5 key
    within the shard.  The within-shard ``row_number`` window is
    PARTITIONED by shard, so the sort is distributed: at 100 TB pick
    ``n_shards`` ~ corpus_bytes / desired_shard_bytes (tens of
    thousands) and each window task sorts one shard, not the corpus.
    The reference has no analogue (its jobs aggregate, never re-order);
    this backs the training-data-layout extension family.
    """
    key = F.md5(F.concat(F.lit("shuf:"), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards).cast(
        "int"
    )
    keyed = df.select(F.col(id_col), key.alias("_k"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return keyed.select(
        F.col(id_col),
        F.col("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --- vocabulary fitting + token-id encoding (tokenizer-lite) ---


def fit_vocab(
    df: DataFrame,
    vocab_size: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Top-``vocab_size`` whitespace tokens by corpus frequency as
    ``(tok, token_id)`` with ids 1..vocab_size (0 is reserved for OOV).
    Ties break lexicographically so the vocabulary is deterministic.
    One explode + one (tok) aggregate + a top-k — the vocab relation is
    tiny (vocab_size rows) and broadcast downstream."""
    counts = (
        df.select(F.explode(tokens_expr(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # top-k via sort+limit on the aggregated relation (|distinct toks|,
    # not |corpus|); deterministic ordering (n desc, tok asc)
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(vocab_size)
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    # the global window runs over <= vocab_size rows (bounded input --
    # exempt from the single-partition-window rule, like the day-grain
    # revenue windows)
    return top.select("tok", F.row_number().over(w).cast("long").alias("token_id"))


def encode_token_ids(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document to its token-id sequence using a fitted
    vocabulary (OOV -> 0).  The encoded corpus is what a training job
    actually reads, so the output keeps one row per doc:
    ``(doc_id, n_tokens, n_oov, ids)`` with ``ids`` a space-joined
    string of token ids in document order (string form keeps the
    row hashable by any downstream engine).

    Plan shape: explode with position -> broadcast-join the tiny vocab
    (map-side, no corpus shuffle) -> one (doc) aggregate re-assembling
    order via array_sort on (pos, id) structs.  Python-free.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).alias("tid"),
    )
    assembled = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == 0, 1).otherwise(0)).cast("long").alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"].cast("string"),
            ),
            " ",
        ).alias("ids"),
    )
    return assembled.select(id_col, "n_tokens", "n_oov", "ids")


# --- corpus-frequency boilerplate-span removal (C4-style line dedup) ---


def remove_boilerplate_spans(
    df: DataFrame,
    span_tokens: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate removal, the C4 "citation/line dedup"
    rule (Raffel et al., JMLR'20: drop any three-sentence span occurring
    more than once in the corpus) adapted to token windows: cut each
    document into consecutive non-overlapping spans of ``span_tokens``
    whitespace tokens, drop every span whose exact text occurs in
    ``min_docs`` or more DISTINCT documents, and re-assemble the
    survivors (plus the short tail window, which is never corpus-wide
    boilerplate by construction) in document order.

    Scale shape (three linear shuffles, nothing corpus-quadratic):
    spans explode off the scan; the occurrence count is a partial+final
    hash aggregate on the 8-byte xxhash64 of the span (not the string);
    removal is a left-anti join of the postings against the
    boilerplate-key relation (shuffle-hash on the same key — at 100 TB
    the boilerplate set is heavy-hitter-sized but unbounded, so it is
    NOT broadcast); re-assembly is one (doc) aggregate ordering spans
    by position.  Output: (doc_id, n_tokens, n_spans, n_removed,
    clean_text).
    """
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    n = F.size("_toks")
    n_spans = F.floor(n / span_tokens).cast("long")
    spans_arr = F.when(
        n >= span_tokens,
        F.transform(
            F.sequence(F.lit(1), (n / span_tokens).cast("int")),
            lambda i: F.array_join(
                F.slice("_toks", (i - 1) * span_tokens + 1, span_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the tail window (< span_tokens tokens past the last full span)
    tail = F.array_join(
        F.slice("_toks", (n_spans * span_tokens + 1).cast("int"), span_tokens), " "
    )
    base = toked.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_spans.alias("n_spans"),
        spans_arr.alias("_spans"),
        tail.alias("_tail"),
    )
    posts = base.select(
        F.col(id_col), F.posexplode("_spans").alias("pos", "span")
    ).withColumn("span_h", F.xxhash64("span"))
    boiler = (
        posts.groupBy("span_h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("span_h")
    )
    kept = (
        posts.join(boiler, "span_h", "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "span"))),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("_kept_text"),
        )
    )
    joined = base.join(kept, id_col, "left")
    clean = (
        F.when(F.col("_kept_text").isNull(), F.col("_tail"))
        .when(F.col("_tail") == "", F.col("_kept_text"))
        .otherwise(F.concat(F.col("_kept_text"), F.lit(" "), F.col("_tail")))
    )
    return joined.select(
        F.col(id_col),
        "n_tokens",
        "n_spans",
        (F.col("n_spans") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        clean.alias("clean_text"),
    )


# --- reference-corpus bigram familiarity (CCNet-style LM quality gate) ---


def bigram_model(df: DataFrame, top_k: int = 200, text_col: str = "text") -> DataFrame:
    """Top-``top_k`` token bigrams of the corpus by frequency — the
    pruned language model a CCNet-style perplexity gate scores against
    (Wenzek et al., LREC'20 filter wikipedia-trained KenLM; here the
    model is n-gram presence, so scoring stays in exact integer/IEEE
    arithmetic instead of engine-dependent transcendental logs).

    One explode + (bigram) hash aggregate; the top-k is a distributed
    TakeOrdered over the AGGREGATED relation (|distinct bigrams|, never
    |corpus|), ties broken lexicographically so the model is
    deterministic.  The result is ``top_k`` rows — broadcast it.
    """
    toked = df.select(tokens_expr(text_col).alias("_toks"))
    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toked.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), F.col("bigram").asc()).limit(top_k)


def bigram_familiarity(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document familiarity against a pruned bigram model: the
    fraction of the document's token bigrams (with multiplicity) found
    in the model.  Low familiarity ≈ high perplexity — gibberish,
    boilerplate markup, or off-distribution text — without the
    cross-engine log() determinism trap (the ratio is one IEEE division
    of exact longs).

    Plan: explode bigrams off the scan, broadcast the ``top_k``-row
    model as a LEFT join (map-side, no corpus shuffle), then one (doc)
    aggregate.  Docs with < 2 tokens have no bigrams and are omitted.
    Output: (doc_id, n_bigrams, n_in_model, familiarity).
    """
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = toked.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
    hit = ex.join(
        F.broadcast(model.select("bigram", F.lit(1).alias("_hit"))), "bigram", "left"
    )
    return (
        hit.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_in_model"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "n_in_model",
            (F.col("n_in_model") / F.col("n_bigrams")).alias("familiarity"),
        )
    )


# --- DSIR-style hashed-ngram importance scoring (domain selection) ---


def dsir_importance(
    df: DataFrame,
    target_col: str,
    n_buckets: int = 64,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    NeurIPS'23): score every document by how much its hashed n-gram
    feature distribution looks like a TARGET domain relative to the raw
    corpus, so a pretraining mix can up-sample target-like documents
    without a learned classifier.

    Features are unigrams + bigrams hashed into ``n_buckets`` buckets
    (the DSIR hashed n-gram generative model).  The per-bucket weight
    is the add-one-smoothed target/raw frequency ratio in integer
    arithmetic — ``w_b = scale * (t_b + 1) div (r_b + 1)`` — standing
    in for DSIR's log-likelihood ratio: exact cross-engine (no
    transcendental logs), same ordering for any fixed scale.  The
    bucket hash is the first 8 md5-hex chars mod ``n_buckets`` (the
    ``shuffle_shards`` cross-engine convention).

    Per-doc importance = mean bucket weight over the doc's features
    (with multiplicity) — one IEEE division of exact longs.

    Plan shape: one feature explode feeding (a) a ``n_buckets``-row
    aggregate (broadcast back) and (b) a (doc, bucket) count; weight
    join is map-side; one final (doc) aggregate.  Nothing scales worse
    than the token count.  ``target_col`` is a boolean column of ``df``.

    Output: (doc_id, n_feats, importance_sum, avg_importance).
    """
    toked = df.select(
        F.col(id_col), F.col(target_col).alias("_tgt"), tokens_expr(text_col).alias("_toks")
    )
    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toked.select(
        F.col(id_col),
        "_tgt",
        F.explode(F.concat(F.col("_toks"), bigrams)).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    bucketed = feats.select(F.col(id_col), "_tgt", bucket.alias("bucket"))
    weights = (
        bucketed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("t"),
            F.count(F.lit(1)).cast("long").alias("r"),
        )
        .select(
            "bucket",
            F.expr(f"{scale}L * (t + 1) div (r + 1)").alias("w"),
        )
    )
    per_doc_bucket = bucketed.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        per_doc_bucket.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("w")).cast("long").alias("importance_sum"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            "importance_sum",
            (F.col("importance_sum") / F.col("n_feats")).alias("avg_importance"),
        )
    )


def dsir_select_by_budget(
    df: DataFrame,
    target_col: str,
    token_budget: int,
    n_buckets: int = 64,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The *resampling* half of DSIR: greedily take documents in
    importance order (most target-like first) until the selected set
    reaches ``token_budget`` whitespace tokens — how a pretraining
    mixture is actually cut once `dsir_importance` has scored a corpus.

    A document is kept while the running token total BEFORE it is under
    budget, so the result always contains the doc that crosses the line
    (standard greedy prefix; never an empty mix for budget > 0).

    Scale shape: the importance scores join token counts on the doc key
    (one co-partitioned shuffle), and the budget cut is a GLOBAL ordered
    prefix sum — computed hierarchically (`operators/windows.py`), never
    an Exchange SinglePartition: range-partition on (-importance, id),
    per-partition running sums, broadcast partition offsets.  Total
    order is (avg_importance DESC, doc_id) — ties cannot reorder the
    cut because the tiebreak key is unique.

    Output: (doc_id, n_tokens, cum_tokens, avg_importance), one row per
    selected document; ``cum_tokens`` is the inclusive running total.
    """
    from . import windows

    imp = dsir_importance(df, target_col, n_buckets, scale, id_col, text_col)
    # n_tokens derives EXACTLY from the importance pass's own feature
    # count (r10): features are unigrams + bigrams with multiplicity,
    # so n_feats = 2n - 1 for n >= 2 and n otherwise, and the
    # whitespace tokenizer always yields >= 1 token (split of an empty
    # trim is [""]), giving n = (n_feats + 1) div 2 for every document.
    # The former plan re-tokenized the whole corpus into a second
    # relation and shuffled it through a doc-key join — a full extra
    # text scan at 100 TB buying a number the first scan already knew.
    scored = imp.withColumn(
        "n_tokens", F.expr("(n_feats + 1) div 2").cast("long")
    ).withColumn("_neg_imp", -F.col("avg_importance"))
    ranked = windows.with_global_running_sum(
        scored, ["_neg_imp", id_col], "n_tokens", "cum_tokens"
    )
    return (
        ranked.filter(F.col("cum_tokens") - F.col("n_tokens") < token_budget)
        .select(id_col, "n_tokens", "cum_tokens", "avg_importance")
    )


def sqrt_temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): per-source sample
    targets proportional to sqrt(count) — the standard multilingual /
    multi-source rebalance (sampling p_s ~ c_s^alpha flattens the head
    so low-resource sources are not drowned; alpha 0.5 is the classic
    mBERT/XLM-R setting).

    Every number is EXACT integer arithmetic so the result is
    engine-independent: weight_s = floor(sqrt(c_s)) (IEEE sqrt is
    correctly rounded, so floor(sqrt) of a BIGINT < 2^53 is identical
    in every engine) and target_s = (total_docs * weight_s) DIV
    total_weight — integer division, never a double quotient whose
    product could exceed 2^53 at corpus scale.  Targets therefore sum
    to <= total_docs (floor rounding); the deficit is the usual
    largest-remainder follow-up a sampler applies downstream.

    Plan: one hash agg on ``group_col`` (map-side partial) — the
    |groups|-row count relation is PINNED so the totals derive from it
    rather than re-aggregating the corpus (unpinned, the physical plan
    scans the source twice) — then a 1-row broadcast of the two totals.
    No window.  Output: (group, n_docs, weight, sample_target), sorted.
    """
    from .dedup import _scoped_cache

    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    counts = _scoped_cache(
        counts.withColumn("weight", F.floor(F.sqrt(F.col("n_docs"))).cast("long")),
        "temp_mixture_counts",
    )
    # the 1-row totals aggregate broadcast into the |groups|-row counts
    # relation is a (free) BroadcastNestedLoopJoin by construction — the
    # same allowlisted shape as keyword_search_topk's corpus-count scalar
    # (tests/test_plans.py CROSS_OK)
    totals = counts.agg(
        F.sum("n_docs").cast("long").alias("_total_docs"),
        F.sum("weight").cast("long").alias("_total_w"),
    )
    return (
        counts.join(F.broadcast(totals))
        .withColumn(
            "sample_target",
            F.expr("(_total_docs * weight) div _total_w").cast("long"),
        )
        .select(group_col, "n_docs", "weight", "sample_target")
        .orderBy(group_col)
    )


def training_export_manifest(
    df: DataFrame,
    shard_token_budget: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """END-TO-END training-data export in one composition: quality gate
    -> exact dedup (keep-min-id) -> deterministic hash training order
    -> greedy token-budget sharding -> per-shard manifest.  This is the
    deliverable a data team hands to the training job: which shard
    holds how many documents and tokens, stable across re-runs.

    Every stage is an existing audited operator: ``quality_filter``
    (C4/Gopher thresholds), ``dedup.dedup_exact`` (md5 fingerprint,
    keep-min-id), the md5 ``'shuf:'`` hash-permutation convention of
    ``shuffle_shards`` (RNG-free, so resumed/re-run exports agree), and
    ``windows.with_global_running_sum`` for the ordered token prefix sum
    — hierarchical (range partitions + broadcast offsets), never an
    Exchange SinglePartition, so the global order costs one range
    shuffle at 100 TB.  shard_id = exclusive_prefix DIV budget: greedy
    sequential fill in integer arithmetic, so a shard ends only after
    the doc that crosses its budget (no empty shards, engine-exact).

    Plan shape: the corpus text is scanned ONCE — the gate features,
    dedup fingerprint, and shuffle key are all projected in a single
    pass (same expressions as ``quality_filter``/``fingerprint``/
    ``shuffle_shards``, semantics identical), and the keep-min-id dedup
    is a min-of-struct hash aggregate on the fingerprint (doc_id leads
    the struct, so the lexicographic MIN selects the min-id row's
    fields) — no semi-join back, so text is never re-derived.  After
    that one scan + one fp shuffle, everything is narrow (id, n_tokens,
    _k) through the range exchange of the prefix sum.  Composing the
    stage operators naively instead re-reads the corpus per stage.

    Output: (shard_id, n_docs, shard_tokens), ordered.
    """
    from . import windows

    toks = tokens_expr(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    n_alpha = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z]", ""))
    ).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS["en"]))
    ).cast("long")
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    feats = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        (n_stop / n_tokens).alias("stopword_ratio"),
        F.md5(normalized).alias("fp"),
        F.md5(F.concat(F.lit("shuf:"), F.col(id_col).cast("string"))).alias("_k"),
    )
    # quality_filter's default thresholds, replayed on the fused columns
    gated = feats.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("alpha_ratio") >= 0.5)
        & (F.col("stopword_ratio") >= 0.01)
        & (F.col("stopword_ratio") <= 0.60)
    ).select(id_col, "n_tokens", "fp", "_k")
    kept = (
        gated.groupBy("fp")
        .agg(F.min(F.struct(id_col, "n_tokens", "_k")).alias("_m"))
        .select(
            F.col(f"_m.{id_col}").alias(id_col),
            F.col("_m.n_tokens").alias("n_tokens"),
            F.col("_m._k").alias("_k"),
        )
    )
    cum = windows.with_global_running_sum(
        kept, ["_k", id_col], "n_tokens", "cum_tokens"
    )
    budget = int(shard_token_budget)
    sharded = cum.withColumn(
        "shard_id",
        F.expr(f"(cum_tokens - n_tokens) div CAST({budget} AS BIGINT)").cast("long"),
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
        )
        .orderBy("shard_id")
    )


def quality_gate_reasons(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.01,
    max_stopword_ratio: float = 0.60,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``quality_filter`` with its decision EXPLAINED: one row per doc
    with a pass flag and the pipe-joined list of failed rules (fixed
    rule order, so the string is engine-independent) — the
    observability twin every production gate needs (what fraction of
    a crawl is dropped, and WHY, per rule).

    Same single-scan stats expressions as ``text_stats``; reasons
    assemble from fixed-order CASE columns through null-skipping
    ``concat_ws`` — no UDFs, no second pass.  ``keep_cols`` pass
    through untouched (e.g. ``("source",)`` for the per-source
    profile — a passthrough column beats a corpus-sized join back).
    Output: (id, *keep_cols, n_tokens, passed [0/1 BIGINT], reasons
    ['' when passed]).
    """
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    n_alpha = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), "[a-zA-Z]", ""))
    ).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS["en"]))
    ).cast("long")
    alpha_ratio = n_alpha / n_chars
    stopword_ratio = n_stop / n_tokens
    rules = [
        F.when(n_tokens < min_tokens, F.lit("too_short")),
        F.when(n_tokens > max_tokens, F.lit("too_long")),
        F.when(alpha_ratio < min_alpha_ratio, F.lit("low_alpha")),
        F.when(stopword_ratio < min_stopword_ratio, F.lit("low_stopword")),
        F.when(stopword_ratio > max_stopword_ratio, F.lit("high_stopword")),
    ]
    reasons = F.concat_ws("|", *rules)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tokens.alias("n_tokens"),
        (reasons == "").cast("long").alias("passed"),
        reasons.alias("reasons"),
    )


def source_quality_profile(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality-gate dashboard: volume, pass count, per-rule
    failure counts, and an exact pass rate in basis points — the
    artifact a crawl operator reads to decide which feeds to fix or
    drop (composes ``quality_gate_reasons`` with one hash aggregate;
    a doc failing two rules counts under both, so rule columns can sum
    past n_docs - n_passed).

    One corpus scan (the gate's single-pass expressions with
    ``group_col`` riding through), one partial+final hash agg on the
    source key; pass_rate_bp = round_half_up(10000 * passed / docs)
    via integer DIV (money.py pattern), engine-exact.
    """
    gated = quality_gate_reasons(
        df, id_col=id_col, text_col=text_col, keep_cols=(group_col,)
    )
    rule = lambda name: F.sum(  # noqa: E731
        F.col("reasons").contains(name).cast("long")
    ).cast("long")
    return (
        gated.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("passed").cast("long").alias("n_passed"),
            rule("too_short").alias("n_too_short"),
            rule("too_long").alias("n_too_long"),
            rule("low_alpha").alias("n_low_alpha"),
            rule("low_stopword").alias("n_low_stopword"),
            rule("high_stopword").alias("n_high_stopword"),
        )
        .withColumn(
            "pass_rate_bp",
            F.expr("(n_passed * 20000 + n_docs) div (2 * n_docs)").cast("long"),
        )
        .orderBy(group_col)
    )


def temperature_sampled_corpus(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXECUTE the sqrt-temperature mixture: deterministically sample
    each source down to its ``sqrt_temperature_mixture`` target —
    ``sample_target`` says how many docs each source contributes; this
    picks WHICH ones (md5 hash-rank order, RNG-free, so re-runs and
    resumed jobs select identical rows).

    Per-source rank comes from the grouped HIERARCHICAL window
    (``windows.with_grouped_row_number``) — sources are the canonical
    few/LARGE groups, and a plain ``Window.partitionBy(source)`` would
    move each source's entire membership into one task (the plan shape
    the registry-wide gate bans).  Targets join back as a broadcast of
    the |sources|-row mixture relation.
    Output: (id, group, pick_rank), pick_rank <= the source's target.
    """
    from . import windows

    targets = sqrt_temperature_mixture(df, group_col, id_col).select(
        group_col, "sample_target"
    )
    keyed = df.select(
        F.col(id_col),
        F.col(group_col),
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))).alias("_k"),
    )
    ranked = windows.with_grouped_row_number(
        keyed, [group_col], [("_k", True), (id_col, True)], "pick_rank"
    )
    return (
        ranked.join(F.broadcast(targets), group_col)
        .filter(F.col("pick_rank") <= F.col("sample_target"))
        .select(id_col, group_col, "pick_rank")
        .orderBy(id_col)
    )


def incremental_export_manifest(
    docs: DataFrame,
    start_offset_tokens: int,
    shard_token_budget: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Arrival-time continuation of ``training_export_manifest``: assign
    a batch of newly accepted documents to training shards CONTINUING a
    global cumulative token count — the streaming export side-channel
    (training jobs consume shards as data lands; assignments must never
    reshuffle history).

    Within the batch, order is the md5 ``'shuf:'`` hash (the batch
    manifest's convention); across batches, order is arrival (epoch)
    order, with ``start_offset_tokens`` = the token total of everything
    assigned so far.  Assignment depends only on that offset plus the
    in-batch prefix sum, so per-epoch calls compose EXACTLY: k
    incremental calls equal one call on the epoch-ordered union
    (pytest-pinned), and a shard that ended mid-epoch stays ended.

    Output per input doc: (id, n_tokens, cum_tokens [inclusive, global],
    shard_id).  Same hierarchical prefix-sum shape as the batch
    manifest; the offset folds in as a literal.
    """
    from . import windows

    start = int(start_offset_tokens)
    budget = int(shard_token_budget)
    toks = docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("shuf:"), F.col(id_col).cast("string"))).alias("_k"),
    )
    cum = windows.with_global_running_sum(
        toks, ["_k", id_col], "n_tokens", "_batch_cum"
    )
    return cum.select(
        F.col(id_col),
        "n_tokens",
        (F.col("_batch_cum") + F.lit(start)).cast("long").alias("cum_tokens"),
        F.expr(
            f"(_batch_cum + {start} - n_tokens) div CAST({budget} AS BIGINT)"
        )
        .cast("long")
        .alias("shard_id"),
    )
