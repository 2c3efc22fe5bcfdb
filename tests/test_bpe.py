"""BPE vocabulary learning — exact-replay contract.

Python's ``str.replace`` has the same greedy left-to-right
non-overlapping semantics as Spark's and DuckDB's ``replace``, so a
tiny pure-Python trainer must reproduce the Spark fit bit-for-bit."""

from collections import Counter

from real_time_event_driven_data_pipeline_spark.operators import bpe

SEP = "\x1f"

CORPUS = [
    (0, "low low low low low lower lower newest newest newest"),
    (1, "newest newest newest widest widest widest low lower"),
    (2, "the newest list of the lowest and widest low rows"),
]


def _replica(n_merges):
    words = Counter()
    for _, t in CORPUS:
        for w in t.strip().split():
            if w and SEP not in w:
                words[w] += 1
    sym = {SEP + SEP.join(w) + SEP: c for w, c in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for s, c in sym.items():
            parts = s.split(SEP)[1:-1]
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n))
        sym = {
            s.replace(f"{SEP}{l}{SEP}{r}{SEP}", f"{SEP}{l}{r}{SEP}"): c
            for s, c in sym.items()
        }
    return merges, sym


def _spark_corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_fit_matches_python_replica_exactly(spark):
    got = bpe.bpe_fit(_spark_corpus(spark), n_merges=6)
    want, _ = _replica(6)
    assert got == want


def test_bpe_fit_partitioning_independent(spark):
    df = _spark_corpus(spark)
    a = bpe.bpe_fit(df.coalesce(1), n_merges=4)
    b = bpe.bpe_fit(df.repartition(7), n_merges=4)
    assert a == b


def test_bpe_encode_budget_matches_replica(spark):
    merges, sym = _replica(6)
    # word -> symbol count under the final merge table
    n_sym = {}
    for s in sym:
        word = "".join(s.split(SEP)[1:-1])
        n_sym[word] = len(s.split(SEP)) - 2
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"])
        for r in bpe.bpe_encode(_spark_corpus(spark), merges).collect()
    }
    want = {}
    for d, t in CORPUS:
        toks = [w for w in t.strip().split() if w and SEP not in w]
        want[d] = (len(toks), sum(n_sym[w] for w in toks))
    assert got == want


def test_bpe_merges_first_pair_is_most_frequent(spark):
    merges = bpe.bpe_fit(_spark_corpus(spark), n_merges=1)
    # 'low'/'lower'/'lowest' dominate: (l, o) or (o, w) is the top pair;
    # replica decides which — just pin determinism + positive count here
    assert len(merges) == 1 and merges[0][0] == 1 and merges[0][3] > 0


def test_bpe_rematerialize_cadence_is_trajectory_invariant(spark):
    """r4 verdict item 4: the localCheckpoint cadence only materializes
    — an aggressive every-2-merges cadence must learn the EXACT same
    merge table (and match the Python replica) as no cadence at all."""
    want, _ = _replica(8)
    frequent = bpe.bpe_fit(
        _spark_corpus(spark), n_merges=8, rematerialize_every=2,
        small_vocab_threshold=None,  # the cadence knob is distributed-only
    )
    never = bpe.bpe_fit(
        _spark_corpus(spark), n_merges=8, rematerialize_every=10**9,
        small_vocab_threshold=None,
    )
    assert frequent == never == want


def test_bpe_encode_text_matches_replica(spark):
    """bpe_encode_text materializes the encoded token stream: every
    word's merged symbols in document order, one flat space-joined
    sequence (round 8 — the vocab-to-loader handoff step)."""
    merges, sym = _replica(6)
    word_syms = {}
    for s in sym:
        word = "".join(s.split(SEP)[1:-1])
        word_syms[word] = " ".join(s.split(SEP)[1:-1])
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"], r["encoded_text"])
        for r in bpe.bpe_encode_text(_spark_corpus(spark), merges).collect()
    }
    want = {}
    for d, t in CORPUS:
        toks = [w for w in t.strip().split() if w and SEP not in w]
        want[d] = (
            len(toks),
            sum(len(word_syms[w].split()) for w in toks),
            " ".join(word_syms[w] for w in toks),
        )
    assert got == want
    # counts agree with the budget view on every doc
    budget = {
        r["doc_id"]: (r["n_words"], r["n_symbols"])
        for r in bpe.bpe_encode(_spark_corpus(spark), merges).collect()
    }
    assert {d: v[:2] for d, v in got.items()} == budget


def test_bpe_fit_local_fast_path_matches_distributed(spark):
    """The small-vocab fast path (round 8 — collected greedy fit, the
    CC-fast-path design call) must reproduce the distributed loop's
    trajectory bit-for-bit, including the (n DESC, lhs, rhs) argmax
    tie-break."""
    df = _spark_corpus(spark)
    local = bpe.bpe_fit(df, n_merges=8)  # default threshold -> local
    dist = bpe.bpe_fit(df, n_merges=8, small_vocab_threshold=None)
    assert local == dist
    want, _ = _replica(8)
    assert local == want
