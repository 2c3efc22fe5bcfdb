"""Distributed BPE-style tokenizer vocabulary learning.

The missing piece between the corpus ops and the token pipeline
(`text.vocab_token_ids` encodes with a FIXED vocab; `token_count_bpe`
only counts): actually LEARNING the merge table from the corpus — the
byte-pair-encoding fit (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units"; the HF-tokenizers training shape).

Scale design — the real BPE-trainer shape:
- The corpus collapses to the DISTINCT-WORD relation with counts
  first (one linear shuffle on the word key).  Vocabulary grows
  sublinearly in corpus size, so every subsequent iteration works on a
  relation ~orders of magnitude smaller than the corpus, cached once.
- Each merge step is: pair-count aggregate over the word relation
  (map-side partials), a ONE-ROW driver collect (the argmax pair —
  same bounded-collect contract as the k-means/perceptron loops), and
  a literal string replace folded into the plan.  No shuffle of
  anything corpus-sized after step 0.

Exact, engine-portable semantics (what makes it oracle-certifiable):
- Words are symbolized as separator-delimited strings
  ``SEP c1 SEP c2 ... SEP`` (SEP = U+001F, filtered out of input).
- A merge (l, r) applies as ``replace(s, SEP+l+SEP+r+SEP, SEP+lr+SEP)``
  — greedy left-to-right, non-overlapping, scan resuming AFTER the
  consumed trailing separator.  Both Spark's `replace` and DuckDB's
  `replace` implement exactly this, so the learned trajectory is
  bit-identical across engines.  The trailing separator in the pattern
  is what keeps multi-character symbols intact (a pattern without it
  could match a PREFIX of a longer right-symbol).  Divergence from
  textbook BPE: on an odd-length run of the merged pair (``a a a``
  with merge (a,a)) the scan-restart skips the boundary re-pair — a
  deliberate, documented trade for exact cross-engine replay.
- Argmax tie-break: highest count, then lexicographically smallest
  (left, right).  Fully deterministic.

No analogue in the reference (`transform.py:28-227`); extends the
SURVEY §2 token-pipeline family (doc_token_ids, token_count_bpe).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SEP = "\x1f"


def word_relation(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt): distinct corpus words with occurrence counts.
    Words containing the symbol separator are dropped (cannot be
    symbolized losslessly); empty tokens are dropped."""
    toks = df.select(F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("word"))
    return (
        toks.filter((F.col("word") != "") & (~F.col("word").contains(SEP)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _symbolized(word: Column) -> Column:
    """``SEP + c1 + SEP + ... + SEP`` — the delimited symbol string."""
    return F.concat(
        F.lit(SEP), F.array_join(F.split(word, ""), SEP), F.lit(SEP)
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """(l, r, n): adjacent-symbol pair counts weighted by word count.
    One explode + one hash agg over the (small) word relation."""
    syms = F.slice(
        F.split(F.col("s"), SEP), 2, F.size(F.split(F.col("s"), SEP)) - 2
    )
    base = sym.select(F.col("cnt"), syms.alias("_sy")).filter(F.size("_sy") >= 2)
    pairs = F.zip_with(
        F.slice("_sy", 1, F.size("_sy") - 1),
        F.slice("_sy", 2, F.size("_sy") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        base.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def _fit_local(
    rows: list, n_merges: int, on_step=None
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE on a collected (word, cnt) relation — the small-vocab
    fast path.  Bit-identical trajectory to the distributed loop by
    construction: Python ``str.replace`` shares Spark/DuckDB
    ``replace``'s greedy left-to-right non-overlapping semantics, pair
    counts are cnt-weighted over adjacent symbols, and the argmax
    tie-break is (n DESC, lhs, rhs) — exactly the distributed
    ``orderBy(...).limit(1)``.  Distinct words can never collide as
    symbol strings (symbols concatenate back to the word), so the dict
    keying is safe.  Property-pinned equal to the distributed path."""
    import time as _time

    from collections import Counter

    sym = {SEP + SEP.join(w) + SEP: c for w, c in rows}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        _t0 = _time.perf_counter()
        pairs: Counter = Counter()
        for s, c in sym.items():
            parts = s.split(SEP)[1:-1]
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, int(n)))
        sym = {
            s.replace(f"{SEP}{l}{SEP}{r}{SEP}", f"{SEP}{l}{r}{SEP}"): c
            for s, c in sym.items()
        }
        if on_step is not None:
            on_step(step, _time.perf_counter() - _t0)
    return merges


def bpe_fit(
    df: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    rematerialize_every: int = 64,
    on_step=None,
    small_vocab_threshold: int | None = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(step, left, right, pair_count), ...]``.

    ``on_step(step, seconds)``, if given, is called after each merge
    with that step's wall time — ops/probe hook only, no effect on the
    trajectory.

    Each step costs one aggregate over the cached word relation and a
    one-row driver collect.  Stops early if no pair remains.

    Re-materialization cadence (r4 verdict item 4): step t's plan
    otherwise re-applies all t prior ``replace``s over the cached base
    — O(n_merges² · vocab) total work and a per-merge-growing
    expression chain, harmless at 10 merges but fatal at a real 32k
    vocabulary.  Every ``rematerialize_every`` merges the symbolized
    relation is checkpointed (``localCheckpoint``: lineage truncated,
    blocks on executors), so per-step cost stays O(vocab · cadence)
    and the plan stops growing.  Values are unchanged — checkpointing
    only materializes, so the learned trajectory stays bit-identical
    (pinned by the cadence-invariance + Python-replica tests and the
    CTE-chain oracle; note the registry query's ``n_merges=10`` never
    reaches the default cadence — the tests exercise
    ``rematerialize_every < n_merges`` explicitly).

    Durability caveat: ``localCheckpoint`` blocks live UNREPLICATED on
    executors and, unlike lineage, are not recomputable — an executor
    loss mid-fit fails the job, which must then be retried from the
    start (same trade as streaming/curation.py's ``_pin``; a long-lived
    production fit should use ``sparkContext.setCheckpointDir`` +
    reliable ``checkpoint()`` instead).

    Small-vocab fast path (r8, the CC-fast-path design call): the fit
    iterates over the DISTINCT-WORD relation, which at test scale is
    tens of words — yet each distributed merge step pays a full
    job's scheduling overhead (measured ~3 s of pure overhead for a
    10-merge fit on a 31-word vocab).  When the vocab fits a bounded
    driver budget (``small_vocab_threshold`` rows; (word, cnt) tuples
    cost ~100 B each, so the 100k default is ~10 MB — broadcast-side
    order), the relation is collected once and fit locally with a
    bit-identical trajectory (``_fit_local``; property-pinned against
    the distributed loop).  Pass ``None`` to force the distributed
    path — the cadence tests and probes do, so it stays exercised.
    At 100 TB a Heaps-law vocabulary blows past any driver budget and
    the distributed loop is the only path; the threshold exists for
    the small-corpus regime where job overhead dominates."""
    words = word_relation(df, id_col, text_col)
    if small_vocab_threshold is not None:
        # bounded probe AND the data in ONE job: at <= threshold rows
        # the limited collect IS the full relation (LIMIT k+1 still
        # short-circuits when the vocab is big, costing only k+1 rows)
        rows = words.limit(small_vocab_threshold + 1).collect()
        if len(rows) <= small_vocab_threshold:
            return _fit_local(
                [(r["word"], int(r["cnt"])) for r in rows], n_merges, on_step
            )
    base = words.select(_symbolized(F.col("word")).alias("s"), "cnt").persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        import time as _time

        sym = base
        pending = 0  # replaces applied since the last materialization
        for step in range(1, n_merges + 1):
            _t0 = _time.perf_counter()
            top = (
                _pair_counts(sym)
                .orderBy(F.col("n").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            merges.append((step, l, r, n))
            sym = sym.withColumn(
                "s",
                F.replace(
                    F.col("s"),
                    F.lit(f"{SEP}{l}{SEP}{r}{SEP}"),
                    F.lit(f"{SEP}{l}{r}{SEP}"),
                ),
            )
            pending += 1
            if pending >= rematerialize_every:
                sym = sym.localCheckpoint(eager=True)
                pending = 0
            if on_step is not None:
                on_step(step, _time.perf_counter() - _t0)
    finally:
        try:
            base.unpersist()
        except Exception:
            pass
    return merges


def bpe_merge_table(
    df: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The learned merge table as a DataFrame:
    (step int, left, right, pair_count long), ordered by step."""
    spark = df.sparkSession
    merges = bpe_fit(df, n_merges, id_col, text_col)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long"
    ).orderBy("step")


def bpe_encode_text(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table and emit the ENCODED TOKEN STREAM —
    the step between vocabulary learning and a training loader
    (``bpe_encode`` stops at counts; this materializes the tokens).

    Output: (id, n_words, n_symbols, encoded_text) where
    ``encoded_text`` is every word's merged symbols, in document order,
    joined by single spaces (one flat symbol stream, the token-ids view
    modulo the symbol->id lookup).  Deterministic: the merge fold is
    the same greedy literal replace as training, identical in Spark and
    DuckDB, so the query is oracle-exact.

    Plan shape: one posexplode (order key), the per-row replace fold,
    one hash aggregate on the id with an in-group sort bounded by
    document length — no windows, no joins, no second corpus pass.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), "\\s+")).alias(
            "pos", "word"
        ),
    ).filter((F.col("word") != "") & (~F.col("word").contains(SEP)))
    s = _symbolized(F.col("word"))
    for _, l, r, _n in merges:
        s = F.replace(s, F.lit(f"{SEP}{l}{SEP}{r}{SEP}"), F.lit(f"{SEP}{l}{r}{SEP}"))
    n_sym = F.size(F.split(s, SEP)) - 2
    sym_str = F.replace(
        F.regexp_replace(s, f"^{SEP}|{SEP}$", ""), F.lit(SEP), F.lit(" ")
    )
    return (
        toks.select(F.col(id_col), "pos", sym_str.alias("_sym"), n_sym.alias("_ns"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_ns").cast("long").alias("n_symbols"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_sym"))),
                    lambda x: x["_sym"],
                ),
                " ",
            ).alias("encoded_text"),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table to encode documents:
    (id, n_words, n_symbols) — the before/after token-budget view.
    Merge application is the same literal-replace fold as training, per
    word, shuffle-free (one explode + per-row exprs + re-agg by id)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("word"),
    ).filter((F.col("word") != "") & (~F.col("word").contains(SEP)))
    s = _symbolized(F.col("word"))
    for _, l, r, _n in merges:
        s = F.replace(s, F.lit(f"{SEP}{l}{SEP}{r}{SEP}"), F.lit(f"{SEP}{l}{r}{SEP}"))
    n_sym = F.size(F.split(s, SEP)) - 2
    return (
        toks.select(F.col(id_col), n_sym.alias("_ns"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_ns").cast("long").alias("n_symbols"),
        )
    )
