"""Dedup-family scale probe: evidence that the candidate-join designs
scale ~linearly in corpus size, not quadratically in pairs.

The driver ships testdata up to sf0.1 (5,000 documents).  This tool
synthesizes larger corpora mirroring the driver generator's structure
(unigram frequency shape, uniform 10-100 token lengths, lang/source
mixes, ~0.3% planted exact duplicates, ~5% near-duplicate copies) and
times the headline dedup queries at 1x and Nx, through the
driver-facing ``queries()`` registry where possible.

Two regimes, because shingle statistics — not row counts — decide the
cost of posting-join near-dup detection:

- SPARSE (the realistic regime): vocabulary grows with the corpus, as
  natural-language vocabularies do (Heaps' law), so per-shingle doc
  frequency stays bounded and posting-join candidates scale with true
  near-dups.  Exact n-gram Jaccard, MinHash-LSH, clustering and the
  full curation pipeline are probed here; the pass bar is
  time_ratio <= 1.25 * multiplier (linear + co-tenant noise).

- SATURATED (the adversarial regime, and the driver corpus's actual
  structure: a fixed 31-word vocab => ~30k possible 3-gram shingles):
  per-shingle df grows LINEARLY with the corpus, so ANY posting-list
  candidate join — capped or not — degenerates toward all-pairs; a
  10x corpus means ~100x candidates.  This is a property of the data,
  not the plan (the r2 probe measured exactly this: uncapped exact
  Jaccard at 10x ran >15 min).  The scale answer is algorithm
  selection: MinHash-LSH banding's candidate probability depends only
  on pair Jaccard (1-(1-J^r)^b), NOT on shingle df, so it stays
  ~linear on the same saturated corpus — which is what this regime
  probes (exact dedup + MinHash-LSH).

Results are appended to PROGRESS.jsonl as a ``"kind": "scale_probe"``
record.

Usage: python tools/scale_probe.py [multiplier]   (default 10)
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_SF = "/root/testdata/sf0.1"

SPARSE_QUERIES = [
    "exact_duplicate_groups",
    "ngram_jaccard_near_dups",
    "minhash_lsh_near_dups",
    "near_dup_clusters",
    "curated_corpus",
    # round-7 additions: the new curation deliverables, probed on the
    # same realistic-vocabulary corpus
    "dup_cluster_representatives",
    "temperature_source_mixture",
    "source_overlap_matrix",
    "training_export_manifest",
    "eval_span_scrub",
]
SATURATED_QUERIES = [
    "exact_duplicate_groups",
    "minhash_lsh_near_dups",  # r=2 banding: informational (see note)
]


def measure_base(con: duckdb.DuckDBPyConnection) -> dict:
    """Pull the distributions the probe corpora mirror from sf0.1."""
    docs = f"'{BASE_SF}/documents.parquet'"
    vocab = con.sql(
        f"SELECT w, COUNT(*) n FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM {docs}) GROUP BY w ORDER BY n DESC"
    ).fetchall()
    langs = con.sql(f"SELECT lang, COUNT(*) FROM {docs} GROUP BY lang").fetchall()
    sources = con.sql(f"SELECT source, COUNT(*) FROM {docs} GROUP BY source").fetchall()
    n_docs, len_lo, len_hi = con.sql(
        f"SELECT COUNT(*), MIN(len(string_split(text,' '))), "
        f"MAX(len(string_split(text,' '))) FROM {docs}"
    ).fetchone()
    n_exact_groups = con.sql(
        f"SELECT COUNT(*) FROM (SELECT text FROM {docs} GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    return {
        "vocab": vocab,
        "langs": langs,
        "sources": sources,
        "n_docs": n_docs,
        "len_range": (len_lo, len_hi),
        "exact_dup_rate": n_exact_groups / n_docs,
    }


def generate(
    stats: dict,
    multiplier: int,
    out_dir: Path,
    grow_vocab: bool,
    seed: int = 7,
) -> int:
    """Write a documents.parquet with multiplier x sf0.1's row count.

    ``grow_vocab=True`` (sparse regime) tiles the observed frequency
    shape across ``multiplier`` x as many distinct words — per-shingle
    doc frequency then matches the 1x corpus, which is how open-vocab
    natural text behaves as a corpus grows.  ``False`` (saturated
    regime) keeps the driver's fixed vocab, so shingle df grows with
    the corpus."""
    rng = random.Random(seed)
    base_words = [w for w, _ in stats["vocab"]]
    base_weights = [n for _, n in stats["vocab"]]
    if grow_vocab:
        words, weights = [], []
        for rep in range(multiplier):
            for w, n in zip(base_words, base_weights):
                words.append(w if rep == 0 else f"{w}_v{rep}")
                weights.append(n)
    else:
        words, weights = base_words, base_weights
    langs = [v for v, _ in stats["langs"]]
    lang_w = [n for _, n in stats["langs"]]
    sources = [v for v, _ in stats["sources"]]
    source_w = [n for _, n in stats["sources"]]
    lo, hi = stats["len_range"]
    n_docs = stats["n_docs"] * multiplier
    near_dup_rate = 0.05  # ~5% of docs are mutated copies (256 pairs/5k)
    exact_dup_rate = stats["exact_dup_rate"]

    texts: list[str] = []
    rows = []
    for i in range(n_docs):
        r = rng.random()
        if texts and r < exact_dup_rate:
            text = rng.choice(texts)
        elif texts and r < exact_dup_rate + near_dup_rate:
            toks = rng.choice(texts).split(" ")
            # mutate ~5% of tokens: 3-gram shingle Jaccard stays ~>0.5
            for _ in range(max(1, len(toks) // 20)):
                toks[rng.randrange(len(toks))] = rng.choices(words, weights)[0]
            text = " ".join(toks)
        else:
            text = " ".join(rng.choices(words, weights, k=rng.randint(lo, hi)))
        texts.append(text)
        rows.append(
            (
                i,
                text,
                rng.choices(langs, lang_w)[0],
                rng.choices(sources, source_w)[0],
                len(text),
            )
        )

    # one parquet file per base-corpus-sized chunk, under a
    # documents.parquet DIRECTORY (spark.read.parquet reads it the same
    # way): at real scale file count grows with the data, and scan/
    # shingle parallelism with it — a single 10x file would serialize
    # the pre-shuffle stages behind one input split and misreport the
    # candidate join as superlinear
    tbl = out_dir / "documents.parquet"
    if tbl.exists():
        import shutil

        shutil.rmtree(tbl)
    tbl.mkdir(parents=True)
    chunk = stats["n_docs"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    for ci in range(0, n_docs, chunk):
        con.execute("DELETE FROM d")
        con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows[ci : ci + chunk])
        con.execute(
            f"COPY d TO '{tbl}/part-{ci // chunk:05d}.parquet' (FORMAT PARQUET)"
        )
    return n_docs


def main() -> None:
    multiplier = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    stats = measure_base(duckdb.connect())
    sparse_base = Path("/tmp/scale_probe/sparse_x1")
    sparse_big = Path(f"/tmp/scale_probe/sparse_x{multiplier}")
    sat_big = Path(f"/tmp/scale_probe/saturated_x{multiplier}")
    # the sparse 1x baseline regenerates with the same generator (the
    # driver corpus itself IS the saturated 1x baseline)
    generate(stats, 1, sparse_base, grow_vocab=True)
    n_sparse = generate(stats, multiplier, sparse_big, grow_vocab=True)
    n_sat = generate(stats, multiplier, sat_big, grow_vocab=False)
    print(f"# generated {n_sparse} sparse + {n_sat} saturated docs", file=sys.stderr)

    import __spark_entry__ as ent
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = ent.queries()
    # warm: JVM, python workers
    spark.range(64, numPartitions=8).mapInPandas(lambda it: it, schema="id long").count()

    def timed(fn, d):
        """min-of-2 wall time: co-tenant CPU variance on this box is
        ±2x, and the first touch of a dir pays listing/codegen costs."""
        best, n = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        return {"sec": round(best, 2), "rows": n}

    def probe(regime: str, names, base_dir: str, big_dir: str) -> dict:
        out = {}
        for name in names:
            per = {}
            for label, d in [("x1", base_dir), (f"x{multiplier}", big_dir)]:
                per[label] = timed(qs[name], d)
                print(f"# [{regime}] {name} @ {label}: {per[label]}", file=sys.stderr)
            per["time_ratio"] = round(
                per[f"x{multiplier}"]["sec"] / max(per["x1"]["sec"], 1e-9), 2
            )
            out[name] = per
        return out

    sparse = probe("sparse", SPARSE_QUERIES, str(sparse_base), str(sparse_big))
    saturated = probe("saturated", SATURATED_QUERIES, BASE_SF, str(sat_big))

    # saturated-regime banding tuned for high random-pair Jaccard:
    # r=2 admits 73% of J=0.2 pairs as candidates (1-(1-J^2)^32) while
    # r=4/b=16 admits 2.5% — and still catches the actual near-dups
    # (P(candidate | J=0.74 planted copies) = 0.997).  This is the knob
    # a saturated corpus requires; the r=2 default stays oracle-parity.
    from real_time_event_driven_data_pipeline_spark.operators import dedup

    def mh_r4(spark_, d):
        return dedup.minhash_lsh_pairs(
            spark_.read.parquet(f"{d}/documents.parquet"),
            threshold=0.5,
            num_hashes=64,
            rows_per_band=4,
            min_parallelism=32,
        )

    per = {}
    for label, d in [("x1", BASE_SF), (f"x{multiplier}", str(sat_big))]:
        per[label] = timed(mh_r4, d)
        print(f"# [saturated] minhash_lsh_r4 @ {label}: {per[label]}", file=sys.stderr)
    per["time_ratio"] = round(
        per[f"x{multiplier}"]["sec"] / max(per["x1"]["sec"], 1e-9), 2
    )
    saturated["minhash_lsh_r4"] = per
    spark.stop()

    bar = 1.25 * multiplier  # linear + 25% co-tenant noise headroom
    gated = list(sparse.values()) + [saturated["exact_duplicate_groups"]]
    # criterion is versioned (ADVICE r3): v1 = the round-2 gate (EVERY
    # probed query incl. saturated minhash must be <= bar, all on the
    # saturated corpus); v2 = the round-3 gate (sparse regime + exact
    # dedup gated, saturated minhash informational).  Both verdicts are
    # recorded so round-over-round comparisons stay honest.
    pass_v1_all_rows = all(
        r["time_ratio"] <= bar
        for fam in (sparse, saturated)
        for r in fam.values()
    )
    record = {
        "ts": time.time(),
        "kind": "scale_probe",
        "criterion_version": 2,
        "multiplier": multiplier,
        "n_docs": {"sparse": n_sparse, "saturated": n_sat},
        "sparse": sparse,
        "saturated": saturated,
        "pass": all(r["time_ratio"] <= bar for r in gated),
        "pass_v1_all_rows": pass_v1_all_rows,
        "note": (
            "GATED (must scale <= linear + 25%): the five sparse-regime "
            "queries — vocabulary grows with the corpus (Heaps' law), so "
            "per-shingle df stays bounded and candidates track true "
            "near-dups, which is how real corpora behave — plus saturated "
            "exact dedup. INFORMATIONAL: the saturated minhash rows. The "
            "saturated corpus (driver structure: fixed 31-word vocab) makes "
            "a constant FRACTION of random pairs quasi-similar, so any "
            "sound candidate scheme pays candidates ~ similar-pair density "
            "x n^2 — an output-complexity property of the data, not a plan "
            "defect; the r=2 vs r=4 banding rows measure exactly that trade "
            "(r=4 cuts J~0.2 admissions ~30x per the banding formula but "
            "the admitted fraction stays constant per pair count)."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
