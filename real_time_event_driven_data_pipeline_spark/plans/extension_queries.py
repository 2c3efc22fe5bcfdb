"""North-star extension queries: dedup, similarity search, text
analysis over the driver's documents/embeddings tables.

Oracle policy: exact operators get DuckDB SQL twins (ratio outputs
unrounded — int/int and in-order double folds are bit-identical across
engines); LSH/SimHash approximate paths are rows-only for the driver
but pinned against their exact twins in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import asof, clustering, dedup, multimodal, rangejoin, similarity, skew, text
from ..sources.readers import load_testdata
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, "documents")["documents"]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, "embeddings")["embeddings"]


# --- text analysis ---

TEXT_STATS_SQL = """
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') t
    FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT)                         AS n_tokens,
       CAST(length(text) AS BIGINT)                   AS n_chars,
       CAST(len(list_filter(t, x -> length(x) >= 0)) AS BIGINT) * 0
         + list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t) AS avg_token_len,
       (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
         / length(text)                               AS alpha_ratio,
       len(list_filter(t, x -> list_contains(
           ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
         / len(t)                                     AS stopword_ratio
FROM toks
ORDER BY doc_id
"""


@register("text_stats", TEXT_STATS_SQL, "ext: text quality scoring / token counting")
def q_text_stats(spark, sf_dir):
    return text.text_stats(_docs(spark, sf_dir)).orderBy("doc_id")


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id
"""


@register("doc_fingerprints", FINGERPRINT_SQL, "ext: document fingerprinting")
def q_doc_fingerprints(spark, sf_dir):
    return text.fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


LANG_ID_SQL = """
WITH toks AS (
    SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> lower(x)) t
    FROM documents
), hits AS (
    SELECT doc_id,
      CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS BIGINT) AS hits_en,
      CAST(len(list_filter(t, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], x))) AS BIGINT) AS hits_es,
      CAST(len(list_filter(t, x -> list_contains(['le','la','de','et','les','des','un','une','est','que'], x))) AS BIGINT) AS hits_fr,
      CAST(len(list_filter(t, x -> list_contains(['der','die','das','und','ist','von','ein','mit','zu','den'], x))) AS BIGINT) AS hits_de,
      CAST(len(list_filter(t, x -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], x))) AS BIGINT) AS hits_zh
    FROM toks
)
SELECT doc_id, hits_en, hits_es, hits_fr, hits_de, hits_zh,
       CASE
         WHEN hits_en > 0 AND hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_zh THEN 'en'
         WHEN hits_es > 0 AND hits_es > hits_en AND hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
         WHEN hits_fr > 0 AND hits_fr > hits_en AND hits_fr > hits_es AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
         WHEN hits_de > 0 AND hits_de > hits_en AND hits_de > hits_es AND hits_de > hits_fr AND hits_de >= hits_zh THEN 'de'
         WHEN hits_zh > 0 AND hits_zh > hits_en AND hits_zh > hits_es AND hits_zh > hits_fr AND hits_zh > hits_de THEN 'zh'
         ELSE 'und'
       END AS lang_pred
FROM hits ORDER BY doc_id
"""


@register("doc_language_id", LANG_ID_SQL, "ext: language identification heuristic")
def q_doc_language_id(spark, sf_dir):
    return text.language_id(_docs(spark, sf_dir)).orderBy("doc_id")


QUALITY_FILTER_SQL = """
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') t
    FROM documents
), stats AS (
    SELECT doc_id,
           len(t) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
             / length(text) AS alpha_ratio,
           len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
             / len(t) AS stopword_ratio
    FROM toks
)
SELECT d.doc_id, d.text FROM documents d
JOIN stats s ON d.doc_id = s.doc_id
WHERE s.n_tokens >= 20 AND s.n_tokens <= 100000
  AND s.alpha_ratio >= 0.5
  AND s.stopword_ratio >= 0.01 AND s.stopword_ratio <= 0.60
ORDER BY d.doc_id
"""


@register("quality_filtered_docs", QUALITY_FILTER_SQL, "ext: C4/Gopher-style quality gate")
def q_quality_filtered_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return text.quality_filter(docs).orderBy("doc_id")


# --- dedup ---

EXACT_DUP_SQL = """
WITH fp AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
)
SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies, MIN(doc_id) AS keep_id
FROM fp GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp
"""


@register("exact_duplicate_groups", EXACT_DUP_SQL, "ext: exact dedup (hash-groupBy)")
def q_exact_duplicate_groups(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir)).orderBy("fp")


NGRAM_JACCARD_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s
    FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s))::DOUBLE
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
ORDER BY id_a, id_b
"""


@register("ngram_jaccard_near_dups", NGRAM_JACCARD_SQL, "ext: n-gram Jaccard near-dup (inverted index)")
def q_ngram_jaccard_near_dups(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# MinHash-LSH: the scale path.  Candidates from banded signatures are
# verified with exact Jaccard, and at the 0.5 threshold with r=2,b=32
# the candidate-recall is ~1-1e-4, so the oracle is the exact query.
@register("minhash_lsh_near_dups", NGRAM_JACCARD_SQL, "ext: MinHash-LSH near-dup")
def q_minhash_lsh_near_dups(spark, sf_dir):
    # documents arrives pre-fanned-out (sources.readers._fanout_small)
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5
    ).orderBy("id_a", "id_b")


# SimHash: ORACLE-EXACT since r5 — the token hash is md5 lower-64
# (Spark md5 == DuckDB md5), so the oracle replays the per-bit majority
# vote (bit j = 1 iff 2*SUM(bit_j(h)) > n_tokens, occurrences weighted)
# and brute-forces all-pairs Hamming; the Spark side's pigeonhole
# banding (C(6,3) block-triple probe keys, lossless at max_hamming
# <= 3 — dedup.hamming_band_keys) must
# reproduce it exactly.  Signatures are packed as 8 byte-bands in the
# SQL (DuckDB's << overflows at bit 63; bytewise xor+bit_count sums to
# the same Hamming distance).


def _simhash_pairs_sql(max_hamming: int) -> str:
    h = "CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)"

    def band(r: int) -> str:
        terms = [
            f"(CASE WHEN 2 * SUM((h >> {8 * r + j}) & 1) > COUNT(*) "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(8)
        ]
        return "CAST(" + " + ".join(terms) + f" AS BIGINT) AS b{r}"

    bands = ",\n         ".join(band(r) for r in range(8))
    ham = " + ".join(f"bit_count(xor(a.b{r}, b.b{r}))" for r in range(8))
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
), th AS (
    SELECT doc_id, {h} AS h FROM toks
), sig AS (
    SELECT doc_id,
         {bands}
    FROM th GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
ORDER BY id_a, id_b"""


@register(
    "simhash_near_pairs",
    _simhash_pairs_sql(3),
    "ext: SimHash near-dup banding (oracle-exact md5 majority vote)",
)
def q_simhash_near_pairs(spark, sf_dir):
    # documents arrives pre-fanned-out (sources.readers._fanout_small),
    # so the Arrow signature fold already parallelizes
    docs = _docs(spark, sf_dir)
    return dedup.simhash_near_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


# --- end-to-end corpus curation (quality gate -> exact dedup ->
#     greedy near-dup removal), the flagship training-data pipeline ---

CURATE_SQL = """
WITH q AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\\s+') t
    FROM documents
), qstats AS (
    SELECT doc_id, text, t,
           len(t) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
             / length(text) AS alpha_ratio,
           len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
             / len(t) AS stopword_ratio
    FROM q
), qualified AS (
    SELECT doc_id, text, t FROM qstats
    WHERE n_tokens >= 20 AND n_tokens <= 100000
      AND alpha_ratio >= 0.5 AND stopword_ratio >= 0.01 AND stopword_ratio <= 0.60
), fp AS (
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM qualified
), keep1 AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
   surv AS (SELECT doc_id, t FROM qualified WHERE doc_id IN (SELECT doc_id FROM keep1)),
   sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s
    FROM surv
), pairs AS (
    SELECT b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
)
SELECT doc_id FROM surv WHERE doc_id NOT IN (SELECT id_b FROM pairs)
ORDER BY doc_id
"""


@register("curated_corpus", CURATE_SQL, "ext: quality gate + exact dedup + near-dup removal pipeline")
def q_curated_corpus(spark, sf_dir):
    # documents arrives pre-fanned-out (sources.readers._fanout_small),
    # covering the interpreted-HOF stages (quality regex battery,
    # fingerprints, shingles)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    qualified = text.quality_filter(docs)
    # LSH pair generation (the scale path); output identical to the
    # exact path at this threshold — pinned in tests/test_extensions.py
    return (
        dedup.curate_corpus(qualified, use_lsh=True)
        .select("doc_id")
        .orderBy("doc_id")
    )


# --- similarity search ---

EMB_PAIRS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.v, b.v)
         / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.45
ORDER BY id_a, id_b
"""


@register("embedding_similar_pairs", EMB_PAIRS_SQL, "ext: embedding-cosine near-dup")
def q_embedding_similar_pairs(spark, sf_dir):
    return similarity.embedding_similar_pairs(_emb(spark, sf_dir), threshold=0.45).orderBy(
        "id_a", "id_b"
    )


ANN_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
     scored AS (
       SELECT q.query_id, e.vec_id,
              list_dot_product(q.qv, e.v)
                / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(e.v, e.v)) AS cos_sim
       FROM q JOIN e ON e.vec_id <> q.query_id
     ),
     ranked AS (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, vec_id) AS rank
       FROM scored
     )
SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


@register("ann_cosine_topk", ANN_TOPK_SQL, "ext: brute-force cosine top-k (ANN baseline)")
def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy("query_id", "rank")


# LSH-bucketed ANN: approximate by construction -> rows-only; recall
# vs the exact top-k is asserted in pytest.
@register("ann_lsh_topk", None, "ext: LSH-bucketed ANN (scale path)")
def q_ann_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim=None: hyperplanes are derived executor-side from the seed and
    # the runtime vector length — plan construction triggers no Spark
    # job (pinned by tests/test_extensions.py's collect-poison fixture)
    out = similarity.lsh_bucket_ann(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy("query_id", "rank")


# IVF ANN: data-adaptive cells (k-means) vs LSH's oblivious hyperplanes;
# approximate -> rows-only, recall pinned in pytest.
@register("ann_ivf_topk", None, "ext: IVF-partitioned ANN (scale path)")
def q_ann_ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = similarity.train_ivf_centroids(emb, n_centroids=16)
    out = similarity.ivf_ann(emb, queries, cent, n_probe=6, k=10)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy("query_id", "rank")


# --- multimodal plumbing over binary columns ---
# The testdata has no media table; documents' bytes stand in as opaque
# payloads so the Arrow-batched decode/feature pipeline (mapInPandas
# over binary + typed metadata) is exercised end-to-end.  The payloads
# are not decodable images, so BOTH codec modes (PIL present or not)
# take the deterministic stub branch — whose byte-grid math the oracle
# mirrors exactly (ASCII corpus: byte i == ord(char i)), upgrading this
# from rows-only to oracle-backed (r3 verdict gap 1).  The real-PNG
# decode branch is pinned separately in tests/test_extensions.py.

MEDIA_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n_bytes,
         greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS side
  FROM documents
)
SELECT media_id,
  CAST(n_bytes AS BIGINT) AS n_bytes,
  CAST(coalesce(list_aggregate(
         list_transform(range(1, n_bytes + 1), i -> ord(text[i])), 'sum'), 0)
       AS BIGINT) AS payload_checksum,
  CASE WHEN n_bytes = 0 THEN 0.0
       ELSE CAST(list_aggregate(
              list_transform(range(1, side * side + 1), i -> ord(text[i])), 'sum')
            AS DOUBLE) / (side * side)
  END AS mean_intensity,
  CAST(least(side, 8) AS INT) AS thumb_w,
  CAST(least(side, 8) AS INT) AS thumb_h
FROM m ORDER BY media_id
"""


@register(
    "media_features", MEDIA_FEATURES_SQL, "ext: multimodal binary-column feature extraction"
)
def q_media_features(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("img/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return multimodal.extract_image_features(media).orderBy("media_id")


# --- image near-dup via banded perceptual hash (dHash) ---------------
# The "dedup x multimodal" composition (r4 verdict gap 1): banded-LSH
# candidates over dHash probe keys + exact Hamming re-verify.
# max_dist = 3 puts the operator on its block-combination path
# (C(6,3) ~33-bit keys — the scale-selective production path; narrow
# bands collide quadratically, see the operator docstring);
# pigeonhole keeps the banding lossless,
# so the DuckDB brute-force all-pairs oracle certifies the banded
# Spark plan exactly.  Same opaque-payload convention as
# media_features: documents' UTF-8 bytes stand in for image payloads,
# both codec modes take the deterministic stub grid, and the oracle
# mirrors the byte math via ord(text[i]) (ASCII corpus: byte i ==
# ord(char i); DuckDB's ord returns -1 on out-of-range, matching the
# stub's all-zero bits for degenerate payloads).

_DHASH_MAX_DIST = 3


def _dhash_band_sql(r: int, off: str = "") -> str:
    """band r = sum_c [p(r,c) < p(r,c+1)] << c over the 8x9 nearest-
    neighbor sample grid (positions (r*side)//8, (c*side)//9 of the
    side x side stub byte grid, row-major).  ``off`` (e.g. ``"idx + "``)
    shifts the grid's base byte — the video path hashes the payload
    SUFFIX starting at frame index ``idx``."""

    def pix(c: int) -> str:
        return f"ord(text[{off}(({r}*side)//8)*side + (({c}*side)//9) + 1])"

    terms = [
        f"(CASE WHEN {pix(c)} < {pix(c + 1)} THEN {1 << c} ELSE 0 END)"
        for c in range(8)
    ]
    return " + ".join(terms)


def _image_near_dups_sql(max_dist: int) -> str:
    bands = ",\n         ".join(
        f"({_dhash_band_sql(r)}) AS b{r}" for r in range(8)
    )
    ham = " + ".join(f"bit_count(xor(a.b{r}, b.b{r}))" for r in range(8))
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text,
         greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS side
  FROM documents
), h AS (
  SELECT media_id,
         {bands}
  FROM m
)
SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
       CAST({ham} AS BIGINT) AS hamming_dist
FROM h a JOIN h b ON a.media_id < b.media_id
WHERE {ham} <= {max_dist}
ORDER BY media_id_a, media_id_b"""


@register(
    "image_near_dups",
    _image_near_dups_sql(_DHASH_MAX_DIST),
    "ext: perceptual image near-dup (banded dHash LSH + exact re-verify)",
)
def q_image_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    # media derives narrowly from the pre-fanned-out documents table
    # (sources.readers._fanout_small), so the Arrow hash stage is wide
    return multimodal.image_near_dups(
        media, max_dist=_DHASH_MAX_DIST
    ).orderBy("media_id_a", "media_id_b")


# --- as-of join: purchase -> most recent prior click per user ---
# Right side deduped to one row per (user, ts) so the match is unique
# and both engines agree deterministically.

ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, MAX(value) AS click_value
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.ts AS asof_ts, c.click_value AS asof_click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
"""


@register("purchase_click_attribution", ASOF_SQL, "custom op: as-of (point-in-time) join")
def q_purchase_click_attribution(spark, sf_dir):
    events = load_testdata(spark, sf_dir, "events")["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return asof.asof_join(
        purchases, clicks, on="ts", by=["user_id"], values=["click_value"]
    ).orderBy("event_id")


# --- batched model inference (operators/inference.py): per-partition
# model load + Arrow batch scoring; the stand-in model is exact IEEE
# arithmetic, so the oracle certifies the whole plumbing path.

MODEL_SCORES_SQL = """
SELECT doc_id,
       ((length(text) - 200.0) / 100.0)
         / (1.0 + abs((length(text) - 200.0) / 100.0)) AS model_score
FROM documents ORDER BY doc_id
"""


@register(
    "doc_model_scores", MODEL_SCORES_SQL, "ext: batched model-inference scoring"
)
def q_doc_model_scores(spark, sf_dir):
    from ..operators import inference

    docs = _docs(spark, sf_dir)
    return inference.batch_score(docs).orderBy("doc_id")


# --- sparse lexical search (operators/search.py): integer tf-idf
# keyword top-k — the inverted-index complement to the dense ANN family.

KEYWORD_QUERIES = [
    (1, "scan"), (1, "column"),
    (2, "window"), (2, "order"), (2, "sort"),
    (3, "hash"), (3, "join"), (3, "shuffle"),
    (4, "group"), (4, "agg"), (4, "value"),
]

KEYWORD_SEARCH_SQL = """
WITH q(query_id, term) AS (VALUES {values}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks
  WHERE term <> '' AND term IN (SELECT term FROM q)
  GROUP BY doc_id, term
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
idf AS (
  SELECT term,
         CAST((1000000 * (n.n_docs + 1)) // (CAST(count(*) AS BIGINT) + 1) AS BIGINT) AS idf
  FROM tf, n GROUP BY term, n.n_docs
),
scores AS (
  SELECT q.query_id, tf.doc_id, CAST(SUM(tf.tf * idf.idf) AS BIGINT) AS score
  FROM q JOIN tf USING (term) JOIN idf USING (term)
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""".format(values=", ".join(f"({qid}, '{t}')" for qid, t in KEYWORD_QUERIES))


@register(
    "keyword_search_topk", KEYWORD_SEARCH_SQL, "ext: sparse lexical search (tf-idf top-k)"
)
def q_keyword_search_topk(spark, sf_dir):
    from ..operators import search

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(KEYWORD_QUERIES, "query_id long, term string")
    return search.keyword_search_topk(docs, queries, k=10).orderBy("query_id", "rank")


# --- SCD2 dimension history (operators/scd2.py): collapse the order
# log into versioned customer-priority intervals.  The oracle mirrors
# the change-compression + interval-stitch windows exactly. ---

SCD2_SQL = """
WITH seq AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM seq WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey, o_orderpriority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL AS is_current
FROM changes
ORDER BY o_custkey, valid_from, o_orderkey
"""


@register(
    "customer_priority_history", SCD2_SQL, "custom op: SCD2 dimension history build"
)
def q_customer_priority_history(spark, sf_dir):
    from ..operators import scd2

    orders = load_testdata(spark, sf_dir, "orders")["orders"]
    return scd2.scd2_build(
        orders,
        key_cols=["o_custkey"],
        attr_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    ).orderBy("o_custkey", "valid_from", "o_orderpriority")


# --- grouped as-of aggregate: ALL prior clicks per purchase, not just
# the latest (operators/asof.py::asof_aggregate; r3 verdict item 8) ---

ASOF_AGG_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       count(c.ts) AS n_clicks_before,
       round(sum(c.value), 4) AS click_value_before,
       max(c.value) AS max_click_before
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY p.event_id
"""


@register(
    "clicks_before_purchase", ASOF_AGG_SQL, "custom op: grouped as-of aggregate"
)
def q_clicks_before_purchase(spark, sf_dir):
    """The oracle's LEFT JOIN ON ts <= ts is |P|x|C| per user; the
    engine's plan is the union + ONE cumulative window scan."""
    events = load_testdata(spark, sf_dir, "events")["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof.asof_aggregate(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        aggs={
            "n_clicks_before": ("value", "count"),
            "click_value_before": ("value", "sum"),
            "max_click_before": ("value", "max"),
        },
    )
    return out.withColumn(
        "click_value_before", F.round("click_value_before", 4)
    ).orderBy("event_id")


# --- range join: clicks inside the hour before each purchase ---

RANGE_JOIN_SQL = """
WITH p AS (SELECT event_id AS purchase_id, user_id,
                  ts - INTERVAL 1 HOUR AS w_start, ts AS w_end
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT c.click_id, c.user_id, c.click_ts, p.purchase_id, p.w_start, p.w_end
FROM c JOIN p ON c.user_id = p.user_id
              AND c.click_ts >= p.w_start AND c.click_ts <= p.w_end
ORDER BY click_id, purchase_id
"""


@register("clicks_in_purchase_windows", RANGE_JOIN_SQL, "custom op: binned range/interval join")
def q_clicks_in_purchase_windows(spark, sf_dir):
    events = load_testdata(spark, sf_dir, "events")["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    return rangejoin.interval_join(
        clicks, purchases, "click_ts", "w_start", "w_end", by=["user_id"]
    ).orderBy("click_id", "purchase_id")


# --- skew-safe aggregation (same semantics as plain COUNT DISTINCT,
#     shuffle bounded per (key, shard) — oracle is the unsalted SQL) ---

SALTED_DISTINCT_SQL = """
SELECT CAST(o_orderdate AS DATE)            AS order_date,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
FROM orders GROUP BY 1 ORDER BY 1
"""


@register("salted_unique_customers", SALTED_DISTINCT_SQL, "scale: salted exact count-distinct")
def q_salted_unique_customers(spark, sf_dir):
    orders = load_testdata(spark, sf_dir, "orders")["orders"]
    return (
        skew.salted_count_distinct(
            orders.withColumn("order_date", F.to_date("o_orderdate")),
            ["order_date"],
            "o_custkey",
            out_alias="unique_customers",
        )
        .orderBy("order_date")
    )


# --- token counting (BPE-ish) ---

BPE_COUNT_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT)
           AS n_bpe_tokens,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


@register("token_counts", BPE_COUNT_SQL, "ext: whitespace + BPE-ish token counting")
def q_token_counts(spark, sf_dir):
    return text.token_count_bpe(_docs(spark, sf_dir)).orderBy("doc_id")


# --- explode/unnest: corpus token frequency (lateral coverage) ---

TOP_TOKENS_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
)
SELECT tok,
       CAST(COUNT(*) AS BIGINT)              AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM toks
GROUP BY tok
ORDER BY n_occurrences DESC, tok
LIMIT 20
"""


@register("top_tokens", TOP_TOKENS_SQL, "lateral/explode: corpus token frequency top-k")
def q_top_tokens(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.explode(text.tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), "tok")
        .limit(20)
    )


# --- near-dup cluster assembly: connected components over pair edges ---
# Pairs alone under-delete (A~B, B~C, A!~C leaves two survivors of one
# group); components give transitive duplicate clusters.  Oracle: the
# same edge set via the exact-Jaccard SQL, closed with a recursive CTE.

NEAR_DUP_CLUSTERS_SQL = """
WITH RECURSIVE toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id, CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END AS s
    FROM toks
), pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
), comps AS (
    SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id
)
SELECT doc_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comps ORDER BY doc_id
"""


@register(
    "near_dup_clusters",
    NEAR_DUP_CLUSTERS_SQL,
    "ext: connected-components duplicate clusters (iterative min-label propagation)",
)
def q_near_dup_clusters(spark, sf_dir):
    from ..operators import components

    # Edges via the MinHash-LSH scale path (banding recall at this
    # threshold is total — pinned in tests/test_extensions.py — so the
    # exact-Jaccard recursive-CTE oracle still matches).
    pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)
    return components.near_dup_clusters(pairs).orderBy("doc_id")


# --- per-label embedding centroids (class prototypes) ---
# The aggregation half of k-means / prototype classifiers: mean vector
# per label.  Floats are summed as exact 1e-9-scaled integers so the
# result is independent of accumulation order (FP sums are not).

EMBEDDING_CENTROIDS_SQL = """
WITH flat AS (
    SELECT label,
           unnest(embedding)                  AS x,
           generate_subscripts(embedding, 1)  AS i
    FROM embeddings
)
SELECT label,
       CAST(i AS INT) AS dim,
       SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000000) AS BIGINT))
         / 1000000000.0 / COUNT(*) AS centroid,
       CAST(COUNT(*) AS BIGINT)    AS n_vectors
FROM flat
GROUP BY label, i
ORDER BY label, dim
"""


@register(
    "embedding_centroids",
    EMBEDDING_CENTROIDS_SQL,
    "ext: per-label mean embedding (posexplode + exact scaled-integer sums)",
)
def q_embedding_centroids(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    scaled = F.round(F.col("x").cast("double") * 1e9).cast("long")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            (F.sum(scaled) / F.lit(1e9) / F.count(F.lit(1))).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


# --- PII scrubbing (redaction pass; fixtures carry the real PII,
#     see tests/test_extensions.py — testdata text is digit-free) ---

PII_SCRUB_SQL = """
WITH s1 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
    FROM documents
), s2 AS (
    SELECT doc_id, n_emails,
           CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ips,
           regexp_replace(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t
    FROM s1
)
SELECT doc_id,
       regexp_replace(t, '\\+?\\d[\\d() -]{7,}\\d', '<PHONE>', 'g') AS clean_text,
       n_emails, n_ips,
       CAST(len(regexp_extract_all(t, '\\+?\\d[\\d() -]{7,}\\d')) AS BIGINT) AS n_phones
FROM s2 ORDER BY doc_id
"""


@register("pii_scrubbed_docs", PII_SCRUB_SQL, "ext: PII redaction (email/IP/phone)")
def q_pii_scrubbed_docs(spark, sf_dir):
    return text.scrub_pii(_docs(spark, sf_dir)).orderBy("doc_id")


# --- deterministic train/val/test split ---

TRAIN_SPLIT_SQL = """
WITH assigned AS (
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM assigned GROUP BY split ORDER BY split
"""


@register(
    "train_split_counts",
    TRAIN_SPLIT_SQL,
    "ext: deterministic hash-keyed train/val/test split",
)
def q_train_split_counts(spark, sf_dir):
    return (
        text.train_split(_docs(spark, sf_dir))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


# --- per-source corpus profile (curation dashboard aggregate) ---

SOURCE_PROFILE_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT)                        AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)                    AS total_chars,
       CAST(FLOOR((2 * SUM(n_chars) + COUNT(*)) / (2 * COUNT(*))) AS BIGINT)
                                                       AS avg_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT)            AS n_langs,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]'))) AS BIGINT)
                                                       AS total_bpe_tokens
FROM documents GROUP BY source ORDER BY source
"""


@register(
    "source_profile",
    SOURCE_PROFILE_SQL,
    "ext: per-source corpus profile (docs/chars/tokens/langs)",
)
def q_source_profile(spark, sf_dir):
    from ..operators.text import BPE_ISH_PATTERN

    docs = _docs(spark, sf_dir)
    n = F.count(F.lit(1))
    tot_chars = F.sum("n_chars")
    return (
        docs.groupBy("source")
        .agg(
            n.alias("n_docs"),
            tot_chars.cast("long").alias("total_chars"),
            # round-half-up integer average (see functions/money.py)
            F.floor((2 * tot_chars + n) / (2 * n)).cast("long").alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(
                F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))
            ).cast("long").alias("total_bpe_tokens"),
        )
        .orderBy("source")
    )


# --- greedy sequential context packing (token budgeting) ---
# Assigns docs (in stable doc_id order) to 4096-token context windows
# by running token count: bin = floor(preceding_cumsum / 4096).  The
# global prefix sum is computed hierarchically (per-partition sums +
# broadcast offsets) so no stage collapses to a single task.

CONTEXT_PACKING_SQL = """
WITH toks AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tok
    FROM documents
), packed AS (
    SELECT doc_id, n_tok,
           CAST(FLOOR((SUM(n_tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 4096)
                AS BIGINT) AS bin
    FROM toks
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT)  AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       MIN(doc_id)               AS first_doc,
       MAX(doc_id)               AS last_doc
FROM packed GROUP BY bin ORDER BY bin
"""


@register(
    "context_packing",
    CONTEXT_PACKING_SQL,
    "ext: greedy sequential packing of docs into 4096-token windows",
)
def q_context_packing(spark, sf_dir):
    # the greedy pack is inherently a global prefix sum, but NOT
    # inherently single-task (round-2 verdict weakness #2): the
    # hierarchical form (per-range-partition running sums + broadcast
    # partition offsets, operators/windows.py) keeps every stage
    # distributed while producing the identical cumulative sums.
    from ..operators.text import BPE_ISH_PATTERN
    from ..operators.windows import with_global_running_sum

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_tok"),
    )
    packed = with_global_running_sum(toks, ["doc_id"], "n_tok", "cum").withColumn(
        "bin", F.floor((F.col("cum") - F.col("n_tok")) / 4096).cast("long")
    )
    return (
        packed.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin")
    )


# --- round 2 additions: chunking, corpus mixing, semantic dedup ---

DOC_CHUNKS_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), st AS (
    SELECT doc_id, t,
           CASE WHEN len(t) > 0
                THEN list_filter(generate_series(1, len(t), 48),
                                 s -> s = 1 OR s + 16 <= len(t))
                ELSE [] END AS starts
    FROM toks
), idx AS (
    SELECT doc_id, t, starts, unnest(generate_series(1, len(starts))) AS i
    FROM st WHERE len(starts) > 0
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT)                                        AS chunk_idx,
       CAST(len(t[starts[i] : least(starts[i] + 63, len(t))]) AS BIGINT)
                                                                    AS n_chunk_tokens,
       array_to_string(t[starts[i] : least(starts[i] + 63, len(t))], ' ')
                                                                    AS chunk_text
FROM idx ORDER BY doc_id, chunk_idx
"""


@register(
    "doc_chunks",
    DOC_CHUNKS_SQL,
    "ext: token-window chunking with overlap (context-window prep)",
)
def q_doc_chunks(spark, sf_dir):
    return text.doc_chunks(
        _docs(spark, sf_dir), chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_idx")


# corpus-mix rates: src0 kept whole, src1 half, src2 quarter, the long
# tail at 10% — the md5 thresholds are the hex cut points of those rates
STRATIFIED_SAMPLE_SQL = """
WITH hashed AS (
    SELECT source, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
    FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM hashed
WHERE (source = 'src0')
   OR (source = 'src1' AND h < '8000')
   OR (source = 'src2' AND h < '4000')
   OR (source NOT IN ('src0', 'src1', 'src2') AND h < '199a')
GROUP BY source ORDER BY source
"""


@register(
    "stratified_sample_counts",
    STRATIFIED_SAMPLE_SQL,
    "ext: deterministic per-source corpus mixing (md5-threshold sampleBy)",
)
def q_stratified_sample_counts(spark, sf_dir):
    kept = text.stratified_sample(
        _docs(spark, sf_dir),
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .orderBy("source")
    )


# feature-hashing embeddings (hashing trick): bucket = first 4 md5 hex
# chars mod dim, sign = parity of the 5th — the project's md5-hex
# portability convention, so Spark and DuckDB agree bit-for-bit
HASHED_EMBEDDING_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
), hashed AS (
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 32 AS INTEGER) AS bucket,
           CASE WHEN CAST(('0x' || substr(md5(tok), 5, 1)) AS BIGINT) % 2 = 0
                THEN 1 ELSE -1 END AS sign
    FROM toks
)
SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
FROM hashed GROUP BY doc_id, bucket ORDER BY doc_id, bucket
"""


@register(
    "hashed_doc_embeddings",
    HASHED_EMBEDDING_SQL,
    "ext: feature-hashing doc vectors (text->embedding, sparse weights)",
)
def q_hashed_doc_embeddings(spark, sf_dir):
    return text.hashed_embedding_weights(_docs(spark, sf_dir), dim=32).orderBy(
        "doc_id", "bucket"
    )


SEMANTIC_DEDUP_SQL = """
WITH RECURSIVE e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
            / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.45
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
), comps AS (
    SELECT id AS vec_id, MIN(comp) AS component FROM reach GROUP BY id
)
SELECT vec_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comps ORDER BY vec_id
"""


@register(
    "semantic_dedup_clusters",
    SEMANTIC_DEDUP_SQL,
    "ext: embedding-cosine near-dup clustering (semantic dedup)",
)
def q_semantic_dedup_clusters(spark, sf_dir):
    return similarity.semantic_dedup_clusters(
        _emb(spark, sf_dir), threshold=0.45
    ).orderBy("vec_id")


# The 100 TB semantic-dedup path (r7 verdict item 2): LSH-bucketed
# candidates -> exact cosine verify -> CC.  The md5-derived hyperplanes
# are engine-independent, so the ORACLE replicates the full LSH
# composition — bucket bits, candidate join, verification, clustering —
# and the comparison is exact, not rows-only.  16 tables x 3 planes is
# the TEST-SCALE recall setting (theoretical recall 0.995 even for the
# hardest pairs at cos == threshold; probed 1.0 at sf0.01, 263/264
# clustered vectors at sf0.1 — PROGRESS.jsonl `lsh_dedup_probe`).  At
# production density raise n_planes ~ log2(corpus / target bucket size)
# so candidate volume tracks true near-dup volume, not corpus^2 —
# `similarity.lsh_planes_for_corpus` derives that automatically.
#
# Spark call and oracle SQL share these constants (round-8 ADVICE:
# the SQL previously hardcoded 16x3 in generate_series bounds and the
# `t * 8` table offset while the Spark side passed its own literals —
# editing one side silently desynced the other).
SEMANTIC_LSH_N_TABLES = 16
SEMANTIC_LSH_N_PLANES = 3
SEMANTIC_LSH_DIM = 64
SEMANTIC_LSH_THRESHOLD = 0.45

SEMANTIC_DEDUP_LSH_SQL = f"""
WITH RECURSIVE e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), planes AS (
    SELECT t.t, p.p,
           list((CAST(('0x' || substr(md5(t.t::VARCHAR || '-' || p.p::VARCHAR
                                       || '-' || d.d::VARCHAR), 1, 8)) AS BIGINT)
                 % 2001 - 1000) / 1000.0 ORDER BY d.d) AS pv
    FROM generate_series(0, {SEMANTIC_LSH_N_TABLES - 1}) t(t),
         generate_series(0, {SEMANTIC_LSH_N_PLANES - 1}) p(p),
         generate_series(0, {SEMANTIC_LSH_DIM - 1}) d(d)
    GROUP BY t.t, p.p
), buckets AS (
    SELECT e.vec_id,
           pl.t * {1 << SEMANTIC_LSH_N_PLANES}
             + CAST(SUM(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
                             THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
    FROM e, planes pl
    GROUP BY e.vec_id, pl.t
), cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
), pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
    WHERE list_dot_product(ea.v, eb.v)
            / sqrt(list_dot_product(ea.v, ea.v) * list_dot_product(eb.v, eb.v))
          >= {SEMANTIC_LSH_THRESHOLD}
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT ed.d, r.comp FROM reach r JOIN edges ed ON ed.s = r.id
), comps AS (
    SELECT id AS vec_id, MIN(comp) AS component FROM reach GROUP BY id
)
SELECT vec_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comps ORDER BY vec_id
"""


@register(
    "semantic_dedup_clusters_lsh",
    SEMANTIC_DEDUP_LSH_SQL,
    "ext: LSH-bucketed semantic dedup (the 100 TB path: postings, not all-pairs)",
)
def q_semantic_dedup_clusters_lsh(spark, sf_dir):
    return similarity.semantic_dedup_clusters_lsh(
        _emb(spark, sf_dir),
        dim=SEMANTIC_LSH_DIM,
        threshold=SEMANTIC_LSH_THRESHOLD,
        n_tables=SEMANTIC_LSH_N_TABLES,
        n_planes=SEMANTIC_LSH_N_PLANES,
        # 16x3 is the pinned test-scale recall setting (oracle hash
        # must never move); density is by design, don't warn per run
        allow_dense=True,
    ).orderBy("vec_id")


REPETITION_SQL = """
WITH base AS (
    SELECT doc_id,
           string_split(text, chr(10)) AS l,
           regexp_split_to_array(trim(text), '\\s+') AS t
    FROM documents
), big AS (
    SELECT doc_id, l,
           CASE WHEN len(t) >= 2
                THEN list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1])
                ELSE [] END AS bg
    FROM base
)
SELECT doc_id,
       1 - len(list_distinct(l))::DOUBLE / len(l)              AS dup_line_ratio,
       CASE WHEN len(bg) > 0
            THEN list_max(list_transform(list_distinct(bg),
                     b -> len(list_filter(bg, x -> x = b))))::DOUBLE / len(bg)
            ELSE 0.0 END                                       AS top_bigram_ratio
FROM big ORDER BY doc_id
"""


@register(
    "doc_repetition_stats",
    REPETITION_SQL,
    "ext: Gopher repetition signals (dup-line / top-bigram ratios)",
)
def q_doc_repetition_stats(spark, sf_dir):
    return text.repetition_stats(_docs(spark, sf_dir)).orderBy("doc_id")


WINNOWING_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_transform(generate_series(1, len(t) - 2),
                         i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS g
    FROM toks
), fps AS (
    SELECT doc_id,
           CASE WHEN len(g) >= 4
                THEN list_transform(generate_series(1, len(g) - 3),
                         i -> list_min(g[i : i + 3]))
                ELSE g END AS f
    FROM grams
)
SELECT doc_id, unnest(list_distinct(f)) AS fp
FROM fps ORDER BY doc_id, fp
"""


@register(
    "doc_winnowing_fingerprints",
    WINNOWING_SQL,
    "ext: winnowing rolling-hash fingerprints (partial-overlap detection)",
)
def q_doc_winnowing_fingerprints(spark, sf_dir):
    return text.winnowing_fingerprints(_docs(spark, sf_dir), k=3, window=4).orderBy(
        "doc_id", "fp"
    )


# deterministic arrival split: doc_id % 5 == 0 plays the "new batch"
INCREMENTAL_NEAR_DUP_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id, CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END AS s
    FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s))::DOUBLE
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
  AND len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
ORDER BY id_a, id_b
"""


@register(
    "incremental_near_dups",
    INCREMENTAL_NEAR_DUP_SQL,
    "ext: arrival-time near-dup gate (new batch vs accumulated corpus)",
)
def q_incremental_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_near_dup_pairs(existing, new, threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# --- train/eval decontamination (benchmark-leakage gate) ---
# Train docs sharing any 3-token shingle with the held-out 'test'
# split (the deterministic md5 split of train_split).  The Spark side
# uses xxhash64-hashed shingles broadcast-joined against the corpus
# postings; the oracle re-derives the same counts from string shingles
# (identical barring 2^-64 hash collisions).

DECONTAM_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s
    FROM toks
), sp AS (
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
), train_posts AS (
    SELECT sh.doc_id, len(s) AS n_shingles, unnest(s) AS shingle
    FROM sh JOIN sp USING (doc_id) WHERE split = 'train'
), eval_sh AS (
    SELECT DISTINCT unnest(s) AS shingle
    FROM sh JOIN sp USING (doc_id) WHERE split = 'test'
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(COUNT(*) AS BIGINT)   AS n_hit,
       COUNT(*) / n_shingles      AS hit_ratio
FROM train_posts
WHERE shingle IN (SELECT shingle FROM eval_sh)
GROUP BY doc_id, n_shingles
ORDER BY doc_id
"""


@register(
    "eval_contamination",
    DECONTAM_SQL,
    "ext: train/eval n-gram decontamination (benchmark-leakage gate)",
)
def q_eval_contamination(spark, sf_dir):
    from ..operators import decontam

    docs = _docs(spark, sf_dir)
    split = text.train_split(docs)
    train = docs.join(split.filter(F.col("split") == "train"), "doc_id", "left_semi")
    ev = docs.join(split.filter(F.col("split") == "test"), "doc_id", "left_semi")
    return decontam.contamination_stats(
        train, ev, k=3, hashed=True
    ).orderBy("doc_id")


# --- deterministic global shuffle (training-order assignment) ---

SHUFFLE_SHARDS_SQL = """
WITH keyed AS (
    SELECT doc_id,
           md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
           CAST(CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 8 AS INTEGER) AS shard
    FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
FROM keyed ORDER BY shard, pos
"""


@register(
    "shuffled_corpus_order",
    SHUFFLE_SHARDS_SQL,
    "ext: deterministic hash-permutation training order (global shuffle)",
)
def q_shuffled_corpus_order(spark, sf_dir):
    return text.shuffle_shards(_docs(spark, sf_dir), n_shards=8).orderBy("shard", "pos")


# --- int8 embedding quantization + reconstruction audit ---

QUANTIZE_SQL = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM e
), q AS (
    SELECT vec_id, v, scale,
           CASE WHEN scale > 0
                THEN list_transform(v, x -> CAST(floor(x / scale) AS BIGINT))
                ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qs
    FROM s
)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS n_dims,
       scale,
       CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_sum,
       list_aggregate(
           list_transform(generate_series(1, len(v)),
               i -> (v[i] - qs[i] * scale) * (v[i] - qs[i] * scale)),
           'sum') / len(v) AS mse
FROM q ORDER BY vec_id
"""


@register(
    "embedding_quantization",
    QUANTIZE_SQL,
    "ext: per-vector int8 scalar quantization + reconstruction error",
)
def q_embedding_quantization(spark, sf_dir):
    return similarity.quantize_embeddings(_emb(spark, sf_dir)).orderBy("vec_id")


# --- vocabulary fit + token-id encoding (tokenizer-lite) ---

TOKEN_IDS_SQL = """
WITH alltoks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
), counts AS (
    SELECT tok, COUNT(*) AS n FROM alltoks WHERE tok <> '' GROUP BY tok
), topv AS (
    SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 256
), vocab AS (
    SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS token_id
    FROM topv
), toksl AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
), posts AS (
    SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM toksl
), enc AS (
    SELECT p.doc_id, p.pos, COALESCE(v.token_id, 0) AS tid
    FROM posts p LEFT JOIN vocab v USING (tok)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS ids
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "doc_token_ids",
    TOKEN_IDS_SQL,
    "ext: corpus vocabulary fit + per-doc token-id encoding",
)
def q_doc_token_ids(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    vocab = text.fit_vocab(docs, vocab_size=256)
    return text.encode_token_ids(docs, vocab).orderBy("doc_id")


# Quantized two-stage ANN: int8 integer-dot prefilter over the narrow
# code relation, exact cosine re-score of candidates only.  The
# prefilter is approximate -> rows-only; recall vs the exact top-k is
# asserted in pytest (tests/test_curation_ops.py).
#
# ORACLE-EXACT since r5: unlike the LSH/IVF variants (seeded-PRNG
# planes / float-accumulated centroids), the two-stage quantized sweep
# is a deterministic function of the input — floor-rule int8 codes,
# integer stage-1 dots (exact in doubles at these magnitudes), and
# explicitly-ordered IEEE folds — so DuckDB can replay BOTH stages
# verbatim: the oracle certifies the approximate algorithm itself, not
# the true top-k.
ANN_QUANTIZED_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / CAST(127.0 AS DOUBLE) AS scale
  FROM e
), cq AS (
  SELECT vec_id, scale,
         CASE WHEN scale > 0
              THEN list_transform(v, x -> CAST(floor(x / scale) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM sc
), cr AS (
  SELECT vec_id, scale, codes,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(codes, c -> CAST(c AS DOUBLE) * scale)),
              (a, x) -> a + x * x)) AS rnorm
  FROM cq
), qq AS (
  SELECT vec_id AS query_id, scale AS q_scale, codes AS q_codes, rnorm AS q_rnorm
  FROM cr WHERE vec_id < 8
), s1 AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(list_transform(c.codes, x -> CAST(x AS DOUBLE)),
                          list_transform(q.q_codes, x -> CAST(x AS DOUBLE)))
           * c.scale * q.q_scale / (c.rnorm * q.q_rnorm + 1e-300) AS approx_sim
  FROM qq q JOIN cr c ON c.vec_id <> q.query_id
), cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY approx_sim DESC, vec_id) AS r
    FROM s1) WHERE r <= 40
), scored AS (
  SELECT cand.query_id, cand.vec_id,
         list_dot_product(qe.v, ce.v)
           / sqrt(list_dot_product(qe.v, qe.v) * list_dot_product(ce.v, ce.v)) AS cos_sim
  FROM cand
  JOIN e ce ON ce.vec_id = cand.vec_id
  JOIN e qe ON qe.vec_id = cand.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


@register(
    "ann_quantized_topk",
    ANN_QUANTIZED_SQL,
    "ext: int8-quantized two-stage ANN (bandwidth-bound scale path, oracle-replayed)",
)
def q_ann_quantized_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.quantized_topk(emb, queries, k=10, oversample=4)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy("query_id", "rank")


# --- corpus boilerplate-span removal (C4 line-dedup analogue) ---
# Spark groups postings by xxhash64(span); the oracle groups by the
# span string itself — identical barring 2^-64 hash collisions (the
# eval_contamination convention).

BOILERPLATE_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t FROM documents
), base AS (
    SELECT doc_id, t, len(t) AS n_tokens,
           CAST(floor(len(t) / 10.0) AS BIGINT) AS n_spans
    FROM toks
), posts AS (
    SELECT doc_id,
           unnest(generate_series(1, n_spans)) AS pos,
           unnest(list_transform(generate_series(1, n_spans),
                    i -> array_to_string(t[(i-1)*10+1 : i*10], ' '))) AS span
    FROM base
), boiler AS (
    SELECT span FROM posts GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
), kept AS (
    SELECT doc_id, COUNT(*) AS n_kept,
           string_agg(span, ' ' ORDER BY pos) AS kept_text
    FROM posts WHERE span NOT IN (SELECT span FROM boiler)
    GROUP BY doc_id
), tailp AS (
    -- an empty slice (doc length a multiple of 10) is NULL in DuckDB;
    -- '' matches Spark's array_join over an empty slice
    SELECT doc_id,
           COALESCE(array_to_string(t[n_spans*10+1 : len(t)], ' '), '') AS tail_text
    FROM base
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       b.n_spans,
       CAST(b.n_spans - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       CASE WHEN k.kept_text IS NULL THEN tp.tail_text
            WHEN tp.tail_text = '' THEN k.kept_text
            ELSE k.kept_text || ' ' || tp.tail_text END AS clean_text
FROM base b LEFT JOIN kept k USING (doc_id) JOIN tailp tp USING (doc_id)
ORDER BY doc_id
"""


@register(
    "boilerplate_free_docs",
    BOILERPLATE_SQL,
    "ext: C4-style corpus boilerplate-span removal (line dedup)",
)
def q_boilerplate_free_docs(spark, sf_dir):
    return text.remove_boilerplate_spans(
        _docs(spark, sf_dir), span_tokens=10, min_docs=2
    ).orderBy("doc_id")


# --- bigram-model familiarity (CCNet-style LM quality gate) ---

BIGRAM_FAMILIARITY_SQL = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t FROM documents
), bg AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN list_transform(generate_series(1, len(t)-1),
                         i -> t[i] || ' ' || t[i+1])
                ELSE [] END AS b
    FROM toks
), ex AS (
    SELECT doc_id, unnest(b) AS bigram FROM bg
), model AS (
    SELECT bigram FROM (
        SELECT bigram, COUNT(*) AS c FROM ex GROUP BY bigram
        ORDER BY c DESC, bigram ASC LIMIT 200
    )
)
SELECT ex.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN m.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_model,
       CAST(SUM(CASE WHEN m.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(COUNT(*) AS BIGINT) AS familiarity
FROM ex LEFT JOIN model m USING (bigram)
GROUP BY ex.doc_id ORDER BY ex.doc_id
"""


@register(
    "doc_bigram_familiarity",
    BIGRAM_FAMILIARITY_SQL,
    "ext: pruned-bigram-model familiarity score (CCNet-style LM gate)",
)
def q_doc_bigram_familiarity(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    model = text.bigram_model(docs, top_k=200)
    return text.bigram_familiarity(docs, model).orderBy("doc_id")


# --- two-stage retrieval: lexical retrieve -> model rerank ---
# Stage 1 is the keyword_search_topk plan at k=20; stage 2 model-scores
# ONLY the candidate docs (bounded |queries| x 20 relation — the
# mapInPandas model never sees the corpus) and re-ranks.  The stand-in
# model is the doc_model_scores rational logistic, so the oracle
# certifies the full two-stage path bit-for-bit.

SEARCH_RERANK_SQL = """
WITH q(query_id, term) AS (VALUES {values}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks
  WHERE term <> '' AND term IN (SELECT term FROM q)
  GROUP BY doc_id, term
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
idf AS (
  SELECT term,
         CAST((1000000 * (n.n_docs + 1)) // (CAST(count(*) AS BIGINT) + 1) AS BIGINT) AS idf
  FROM tf, n GROUP BY term, n.n_docs
),
scores AS (
  SELECT q.query_id, tf.doc_id, CAST(SUM(tf.tf * idf.idf) AS BIGINT) AS score
  FROM q JOIN tf USING (term) JOIN idf USING (term)
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scores
),
resc AS (
  SELECT r.query_id, r.doc_id, r.score AS lex_score,
         ((length(d.text) - 200.0) / 100.0)
           / (1.0 + abs((length(d.text) - 200.0) / 100.0)) AS model_score
  FROM ranked r JOIN documents d USING (doc_id)
  WHERE r.rank <= 20
),
rr AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY model_score DESC, lex_score DESC, doc_id) AS rerank
  FROM resc
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, lex_score, model_score,
       CAST(rerank AS INT) AS rerank
FROM rr WHERE rerank <= 10 ORDER BY query_id, rerank
""".format(values=", ".join(f"({qid}, '{t}')" for qid, t in KEYWORD_QUERIES))


@register(
    "search_rerank_topk",
    SEARCH_RERANK_SQL,
    "ext: two-stage retrieval (lexical top-k -> model rerank)",
)
def q_search_rerank_topk(spark, sf_dir):
    from ..operators import inference, search
    from ..operators.dedup import _scoped_cache

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(KEYWORD_QUERIES, "query_id long, term string")
    # pinned: stage-1 candidates feed BOTH the rerank join and the
    # candidate-id semi filter — uncached, the whole lexical retrieval
    # subtree executes twice (r10 plan audit).  Bounded: |queries| x k.
    cands = _scoped_cache(
        search.keyword_search_topk(docs, queries, k=20), "rerank_cands"
    )
    cand_ids = cands.select("doc_id").dropDuplicates()
    # model-score only the candidates: broadcast-semi the bounded id
    # set into the corpus scan, then the per-partition-loaded model
    cand_docs = docs.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    scored = inference.batch_score(cand_docs)
    return search.rerank_topk(cands, scored, k=10).orderBy("query_id", "rerank")


# --- DSIR hashed-ngram importance scoring (domain selection) ---
# Target domain = source 'src0'; the bucket hash is the md5-hex
# convention shared with shuffled_corpus_order, and the integer weight
# mirrors keyword search's integer idf (// == div, positive operands).

DSIR_SQL = r"""
WITH toks AS (
    SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') t
    FROM documents
), feats AS (
    SELECT doc_id, source = 'src0' AS tgt,
           unnest(list_concat(t,
             CASE WHEN len(t) >= 2
                  THEN list_transform(generate_series(1, len(t)-1),
                           i -> t[i] || ' ' || t[i+1])
                  ELSE [] END)) AS feat
    FROM toks
), bk AS (
    SELECT doc_id, tgt,
           CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 64 AS bucket
    FROM feats
), w AS (
    SELECT bucket,
           CAST((1000000 * (CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) + 1))
                // (CAST(COUNT(*) AS BIGINT) + 1) AS BIGINT) AS w
    FROM bk GROUP BY bucket
), dc AS (
    SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM bk GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_feats,
       CAST(SUM(c * w.w) AS BIGINT) AS importance_sum,
       CAST(SUM(c * w.w) AS BIGINT) / CAST(SUM(c) AS BIGINT) AS avg_importance
FROM dc JOIN w USING (bucket)
GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "dsir_importance_scores",
    DSIR_SQL,
    "ext: DSIR hashed-ngram importance scoring (domain up-sampling weights)",
)
def q_dsir_importance_scores(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("_is_target", F.col("source") == "src0")
    return text.dsir_importance(docs, "_is_target", n_buckets=64).orderBy("doc_id")


# --- DSIR budget resampling (mixture construction from the scores) ---
# Greedy importance-ordered prefix under a token budget; the global
# ordered cumsum is hierarchical on the Spark side (plan-gated: no
# single-partition window) and a plain window in the oracle.

_DSIR_BUDGET = 25_000

DSIR_RESAMPLE_SQL = f"""
WITH imp AS ({DSIR_SQL}),
tok AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), ranked AS (
    SELECT i.doc_id, t.n_tokens, i.avg_importance,
           CAST(SUM(t.n_tokens) OVER (
                ORDER BY i.avg_importance DESC, i.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
    FROM imp i JOIN tok t USING (doc_id)
)
SELECT doc_id, n_tokens, cum_tokens, avg_importance
FROM ranked
WHERE cum_tokens - n_tokens < {_DSIR_BUDGET}
ORDER BY cum_tokens, doc_id
"""


@register(
    "dsir_resampled_mixture",
    DSIR_RESAMPLE_SQL,
    "ext: DSIR budget resampling (importance-ordered token-budget prefix)",
)
def q_dsir_resampled_mixture(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("_is_target", F.col("source") == "src0")
    return text.dsir_select_by_budget(
        docs, "_is_target", token_budget=_DSIR_BUDGET, n_buckets=64
    ).orderBy("cum_tokens", "doc_id")


# --- distributed exact k-means (SemDeDup-style clustering stage) ---
# Lloyd's iterations with integer-quantized arithmetic so the fitted
# model is engine- and partitioning-independent (operators/clustering.py
# documents the scale shape: broadcast-literal assignment, map-side
# partial 2·dim-measure aggregate, ≤k-row collects).  The oracle unrolls
# the same fixed iterations as chained CTEs.

_KM_K = 8
_KM_ITERS = 3


def _kmeans_cte_chain(k: int, iters: int) -> str:
    """WITH-chain prefix shared by the centroid and sampling oracles:
    quantize -> init -> iters x (assign, update) -> final assign
    (``asg{iters+1}`` is the assignment under the final centroids)."""
    parts = [
        f"""
WITH flatv AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
           CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qx
    FROM embeddings
), init_ids AS (
    SELECT vec_id,
           CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
), cent0 AS (
    SELECT i.cluster, f.dim, f.qx AS cq
    FROM init_ids i JOIN flatv f USING (vec_id)
)"""
    ]
    for t in range(1, iters + 2):
        prev = f"cent{t - 1}"
        parts.append(
            f""", dist{t} AS (
    SELECT f.vec_id, c.cluster,
           SUM((f.qx - c.cq) * (f.qx - c.cq)) AS d
    FROM flatv f JOIN {prev} c USING (dim)
    GROUP BY f.vec_id, c.cluster
), asg{t} AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM dist{t})
    WHERE rn = 1
)"""
        )
        if t <= iters:  # update step (the last assign is the final one)
            parts.append(
                f""", newc{t} AS (
    SELECT a.cluster, f.dim,
           CAST(FLOOR(CAST(SUM(f.qx) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
    FROM asg{t} a JOIN flatv f USING (vec_id)
    GROUP BY a.cluster, f.dim
), cent{t} AS (
    SELECT p.cluster, p.dim, COALESCE(r.cq, p.cq) AS cq
    FROM cent{t - 1} p
    LEFT JOIN newc{t} r ON r.cluster = p.cluster AND r.dim = p.dim
)"""
            )
    return "".join(parts)


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    return (
        _kmeans_cte_chain(k, iters)
        + f"""
SELECT c.cluster AS cluster, c.dim AS dim, c.cq AS centroid_q,
       COALESCE(s.n, 0) AS n_vectors
FROM cent{iters} c
LEFT JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
           FROM asg{iters + 1} GROUP BY cluster) s
  ON s.cluster = c.cluster
ORDER BY c.cluster, c.dim"""
    )


@register(
    "kmeans_centroids",
    _kmeans_oracle_sql(_KM_K, _KM_ITERS),
    "ext: distributed exact-integer k-means (clustering stage for semantic dedup)",
)
def q_kmeans_centroids(spark, sf_dir):
    return clustering.kmeans_centroid_table(
        _emb(spark, sf_dir), k=_KM_K, iters=_KM_ITERS
    )


# --- cluster-balanced coverage sample (per-cluster top-m by hash) ---

_KM_SAMPLE_M = 50


def _kmeans_sample_oracle_sql(k: int, iters: int, m: int) -> str:
    return (
        _kmeans_cte_chain(k, iters)
        + f""", pri AS (
    SELECT a.vec_id, a.cluster,
           CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8)) AS BIGINT) AS p
    FROM asg{iters + 1} a
), ranked AS (
    SELECT vec_id, cluster,
           CAST(ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY p, vec_id) AS INT) AS rk
    FROM pri
)
SELECT vec_id, cluster, rk
FROM ranked WHERE rk <= {m}
ORDER BY cluster, rk"""
    )


@register(
    "kmeans_balanced_sample",
    _kmeans_sample_oracle_sql(_KM_K, _KM_ITERS, _KM_SAMPLE_M),
    "ext: cluster-balanced coverage sample (per-cluster top-m by hash priority)",
)
def q_kmeans_balanced_sample(spark, sf_dir):
    return clustering.cluster_balanced_sample(
        _emb(spark, sf_dir),
        per_cluster=_KM_SAMPLE_M,
        k=_KM_K,
        iters=_KM_ITERS,
    ).orderBy("cluster", "rk")


# --- quality-classifier training (operators/classifier.py): full-batch
# integer perceptron on hashed features, weak labels from the rule
# gate.  Every quantity is an exact int64, so the oracle replays the
# identical training trajectory as a CTE chain (the k-means pattern).

_CLF_DIM = 32
_CLF_ITERS = 3


def _classifier_cte_chain(dim: int, iters: int) -> str:
    """WITH-chain shared by the scoring and curriculum oracles: hashed
    features + rule-gate labels + iters x (margin, gradient, weights),
    ending with the final-margin CTE ``mfin``."""
    parts = [
        f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
), sparse AS (
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % {dim} AS INTEGER) AS j,
           CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 5, 1)) AS BIGINT) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS x
    FROM toks GROUP BY doc_id, j
), feat AS (
    SELECT * FROM sparse
    UNION ALL SELECT doc_id, {dim} AS j, CAST(1 AS BIGINT) AS x FROM documents
), st AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), labels AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 20 AND len(t) <= 100000
                 AND (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
                       / length(text) >= 0.5
                 AND len(list_filter(t, x -> list_contains(
                       ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
                       / len(t) >= 0.01
                 AND len(list_filter(t, x -> list_contains(
                       ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
                       / len(t) <= 0.60
                THEN 1 ELSE -1 END AS y
    FROM st
), w0 AS (
    SELECT unnest(range(0, {dim + 1})) AS j, CAST(0 AS BIGINT) AS w
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""", m{t} AS (
    SELECT f.doc_id, CAST(SUM(p.w * f.x) AS BIGINT) AS m
    FROM feat f JOIN w{t - 1} p ON p.j = f.j GROUP BY f.doc_id
), g{t} AS (
    SELECT f.j, CAST(SUM(l.y * f.x) AS BIGINT) AS g
    FROM feat f
    JOIN labels l ON l.doc_id = f.doc_id
    JOIN m{t} ON m{t}.doc_id = f.doc_id
    WHERE l.y * m{t}.m <= 0
    GROUP BY f.j
), w{t} AS (
    SELECT p.j, p.w + COALESCE(g{t}.g, 0) AS w
    FROM w{t - 1} p LEFT JOIN g{t} ON g{t}.j = p.j
)"""
        )
    parts.append(
        f""", mfin AS (
    SELECT f.doc_id, CAST(SUM(p.w * f.x) AS BIGINT) AS m
    FROM feat f JOIN w{iters} p ON p.j = f.j GROUP BY f.doc_id
)"""
    )
    return "".join(parts)




def _classifier_oracle_sql(dim: int, iters: int) -> str:
    return (
        _classifier_cte_chain(dim, iters)
        + """
SELECT l.doc_id, CAST(l.y AS INTEGER) AS label, mfin.m AS margin,
       CAST(CASE WHEN mfin.m > 0 THEN 1 ELSE -1 END AS INTEGER) AS pred
FROM labels l JOIN mfin ON mfin.doc_id = l.doc_id
ORDER BY l.doc_id"""
    )


@register(
    "quality_classifier_scores",
    _classifier_oracle_sql(_CLF_DIM, _CLF_ITERS),
    "ext: weak-label perceptron training + corpus scoring (integer-exact)",
)
def q_quality_classifier_scores(spark, sf_dir):
    from ..operators import classifier

    return classifier.quality_classifier_scores(
        _docs(spark, sf_dir), dim=_CLF_DIM, iters=_CLF_ITERS
    ).orderBy("doc_id")


# --- BPE vocabulary learning (operators/bpe.py): iterative pair-count
# -> merge on the distinct-word relation.  Merge application is a
# literal separator-delimited replace with IDENTICAL greedy semantics
# in Spark and DuckDB, so the oracle replays the whole training
# trajectory as a CTE chain (the k-means/perceptron pattern).

_BPE_MERGES = 10


def _bpe_cte_chain(n_merges: int) -> str:
    """WITH-chain: words -> symbolized s0 -> n x (pair-count, argmax,
    replace).  Keeps the word key through the chain so the encode
    oracle can join per-doc tokens to final symbol counts."""
    parts = [
        r"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
), words AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
    WHERE word <> '' AND position(chr(31) IN word) = 0
    GROUP BY word
), s0 AS (
    SELECT word,
           chr(31) || array_to_string(regexp_split_to_array(word, ''), chr(31)) || chr(31) AS s,
           cnt
    FROM words
)"""
    ]
    for t in range(1, n_merges + 1):
        parts.append(
            f""", p{t} AS (
    SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(SUM(cnt) AS BIGINT) AS n
    FROM (
      SELECT cnt, unnest(list_transform(range(2, len(parts) - 1),
                   i -> [parts[i], parts[i + 1]])) AS pr
      FROM (SELECT string_split(s, chr(31)) AS parts, cnt FROM s{t - 1})
    )
    GROUP BY pr[1], pr[2]
), best{t} AS (
    SELECT lhs, rhs, n FROM p{t} ORDER BY n DESC, lhs, rhs LIMIT 1
), s{t} AS (
    SELECT word,
           replace(s, chr(31) || b.lhs || chr(31) || b.rhs || chr(31),
                      chr(31) || b.lhs || b.rhs || chr(31)) AS s,
           cnt
    FROM s{t - 1}, best{t} b
)"""
        )
    return "".join(parts)


def _bpe_merge_oracle_sql(n_merges: int) -> str:
    steps = "\n    UNION ALL ".join(
        f"SELECT {t} AS step, lhs, rhs, n AS pair_count FROM best{t}"
        for t in range(1, n_merges + 1)
    )
    return (
        _bpe_cte_chain(n_merges)
        + f"""
SELECT CAST(step AS INTEGER) AS step, lhs, rhs, pair_count
FROM ({steps})
ORDER BY step"""
    )


def _bpe_budget_oracle_sql(n_merges: int) -> str:
    return (
        _bpe_cte_chain(n_merges)
        + f""", wsym AS (
    SELECT word, CAST(len(string_split(s, chr(31))) - 2 AS BIGINT) AS n_sym
    FROM s{n_merges}
), dtoks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_sym) AS BIGINT) AS n_symbols
FROM dtoks d JOIN wsym w ON w.word = d.word
GROUP BY d.doc_id
ORDER BY d.doc_id"""
    )


@register(
    "bpe_merge_table",
    _bpe_merge_oracle_sql(_BPE_MERGES),
    "ext: BPE vocabulary learning (iterative pair-count merge fit)",
)
def q_bpe_merge_table(spark, sf_dir):
    from ..operators import bpe

    return bpe.bpe_merge_table(_docs(spark, sf_dir), n_merges=_BPE_MERGES)


@register(
    "bpe_token_budget",
    _bpe_budget_oracle_sql(_BPE_MERGES),
    "ext: per-doc token budget under the learned BPE merges",
)
def q_bpe_token_budget(spark, sf_dir):
    from ..operators import bpe

    docs = _docs(spark, sf_dir)
    merges = bpe.bpe_fit(docs, n_merges=_BPE_MERGES)
    return bpe.bpe_encode(docs, merges).orderBy("doc_id")


def _bpe_encoded_oracle_sql(n_merges: int) -> str:
    """Encode oracle: final symbolized words join back to doc tokens
    WITH their positions (LATERAL range unnest), and the per-doc token
    stream re-assembles via string_agg ORDER BY pos — the same greedy
    replace chain as training, so the encoded text is engine-exact."""
    return (
        _bpe_cte_chain(n_merges)
        + f""", wsymstr AS (
    SELECT word,
           CAST(len(string_split(trim(BOTH chr(31) FROM s), chr(31))) AS BIGINT)
             AS n_sym,
           replace(trim(BOTH chr(31) FROM s), chr(31), ' ') AS symstr
    FROM s{n_merges}
), dtoks AS (
    SELECT t.doc_id, u.pos, t.ws[u.pos] AS word
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
          FROM documents) t,
         LATERAL (SELECT unnest(range(1, len(t.ws) + 1)) AS pos) u
    WHERE t.ws[u.pos] <> '' AND position(chr(31) IN t.ws[u.pos]) = 0
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_sym) AS BIGINT) AS n_symbols,
       string_agg(w.symstr, ' ' ORDER BY d.pos) AS encoded_text
FROM dtoks d JOIN wsymstr w USING (word)
GROUP BY d.doc_id
ORDER BY d.doc_id"""
    )


@register(
    "bpe_encoded_docs",
    _bpe_encoded_oracle_sql(_BPE_MERGES),
    "ext: the encoded token stream under the learned BPE merges",
)
def q_bpe_encoded_docs(spark, sf_dir):
    from ..operators import bpe

    docs = _docs(spark, sf_dir)
    merges = bpe.bpe_fit(docs, n_merges=_BPE_MERGES)
    return bpe.bpe_encode_text(docs, merges).orderBy("doc_id")


# --- count-min sketch heavy hitters (operators/sketches.py): the
# oracle-exact frequency sketch (deterministic md5 row hashes), unlike
# the rows-only seeded HLL queries.  est >= true count always; top-n
# by estimate with a full deterministic tie-break.

_CMS_D = 4
_CMS_W = 512
_CMS_TOP = 20

CMS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents
), t AS (
    SELECT token FROM toks WHERE token <> ''
), rows_r AS (
    SELECT unnest(range(0, {_CMS_D})) AS r
), posts AS (
    SELECT t.token, rows_r.r,
           CAST(CAST(('0x' || substr(md5(CAST(rows_r.r AS VARCHAR) || ':' || t.token), 1, 8))
                AS BIGINT) % {_CMS_W} AS INTEGER) AS bucket
    FROM t, rows_r
), cms AS (
    SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM posts GROUP BY r, bucket
), probes AS (
    SELECT k.token, rows_r.r,
           CAST(CAST(('0x' || substr(md5(CAST(rows_r.r AS VARCHAR) || ':' || k.token), 1, 8))
                AS BIGINT) % {_CMS_W} AS INTEGER) AS bucket
    FROM (SELECT DISTINCT token FROM t) k, rows_r
), est AS (
    SELECT p.token, MIN(c.cnt) AS est_count
    FROM probes p JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY p.token
)
SELECT token, est_count FROM est
ORDER BY est_count DESC, token LIMIT {_CMS_TOP}
"""


@register(
    "cms_heavy_hitters",
    CMS_HEAVY_HITTERS_SQL,
    "ext: count-min sketch heavy hitters (mergeable, oracle-exact)",
)
def q_cms_heavy_hitters(spark, sf_dir):
    from ..operators import sketches

    return sketches.token_heavy_hitters(
        _docs(spark, sf_dir), top_n=_CMS_TOP, d=_CMS_D, w=_CMS_W
    )


# --- hybrid retrieval with reciprocal-rank fusion (operators/search.py):
# lexical tf-idf ranks + integer hashed-embedding dense ranks, fused as
# 1/(60+rank) sums.  Every rank is integer-exact and the fusion is two
# correctly-rounded IEEE divisions, so even the fused ORDER replays
# bit-identically in the oracle.

HYBRID_RRF_SQL = """
WITH q(query_id, term) AS (VALUES {values}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term <> '' AND term IN (SELECT term FROM q)
  GROUP BY doc_id, term
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
idf AS (
  SELECT term,
         CAST((1000000 * (n.n_docs + 1)) // (CAST(count(*) AS BIGINT) + 1) AS BIGINT) AS idf
  FROM tf, n GROUP BY term, n.n_docs
),
lscores AS (
  SELECT q.query_id, tf.doc_id, CAST(SUM(tf.tf * idf.idf) AS BIGINT) AS score
  FROM q JOIN tf USING (term) JOIN idf USING (term)
  GROUP BY q.query_id, tf.doc_id
),
lex AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT) AS lex_rank
  FROM lscores QUALIFY lex_rank <= 20
),
wtoks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
demb AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 32 AS INTEGER) AS bucket,
         CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 5, 1)) AS BIGINT) % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS weight
  FROM wtoks GROUP BY doc_id, bucket
),
qemb AS (
  SELECT query_id,
         CAST(CAST(('0x' || substr(md5(term), 1, 4)) AS BIGINT) % 32 AS INTEGER) AS bucket,
         CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(term), 5, 1)) AS BIGINT) % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS qw
  FROM q GROUP BY query_id, bucket
),
dots AS (
  SELECT qe.query_id, de.doc_id, CAST(SUM(de.weight * qe.qw) AS BIGINT) AS dense_score
  FROM demb de JOIN qemb qe ON qe.bucket = de.bucket
  GROUP BY qe.query_id, de.doc_id
),
dense AS (
  SELECT query_id, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY dense_score DESC, doc_id) AS INT) AS dense_rank
  FROM dots QUALIFY dense_rank <= 20
),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0)
           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.dense_rank), 0) AS rrf_score
  FROM lex l FULL JOIN dense d ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, lex_rank, dense_rank, rrf_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10
ORDER BY query_id, rank
""".format(values=", ".join(f"({qid}, '{t}')" for qid, t in KEYWORD_QUERIES))


@register(
    "hybrid_rrf_search",
    HYBRID_RRF_SQL,
    "ext: hybrid lexical+dense retrieval, reciprocal-rank fusion",
)
def q_hybrid_rrf_search(spark, sf_dir):
    from ..operators import search

    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(KEYWORD_QUERIES, "query_id long, term string")
    return search.hybrid_rrf_topk(
        docs, queries, k=10, k_retrieve=20
    ).orderBy("query_id", "rank")


# --- FineWeb-style curriculum cut: top-q% per source by classifier
# margin (operators/classifier.py::margin_curriculum_cut).  Per-source
# integer quotas + deterministic (margin desc, id) ranking make the
# whole selection oracle-exact on top of the training CTE chain.

_CURR_PCT = 25


def _curriculum_oracle_sql(dim: int, iters: int, pct: int) -> str:
    return (
        _classifier_cte_chain(dim, iters)
        + f""", src AS (
    SELECT d.doc_id, d.source, mfin.m AS margin
    FROM documents d JOIN mfin ON mfin.doc_id = d.doc_id
), quotas AS (
    SELECT source, (CAST(COUNT(*) AS BIGINT) * {pct} + 99) // 100 AS k
    FROM src GROUP BY source
), ranked AS (
    SELECT s.source, s.doc_id, s.margin,
           CAST(ROW_NUMBER() OVER (PARTITION BY s.source
                                   ORDER BY s.margin DESC, s.doc_id) AS BIGINT) AS rk,
           q.k
    FROM src s JOIN quotas q ON q.source = s.source
)
SELECT source, doc_id, margin, rk FROM ranked WHERE rk <= k
ORDER BY source, rk"""
    )


@register(
    "margin_curriculum_cut",
    _curriculum_oracle_sql(_CLF_DIM, _CLF_ITERS, _CURR_PCT),
    "ext: per-source top-q% curriculum selection by classifier margin",
)
def q_margin_curriculum_cut(spark, sf_dir):
    from ..operators import classifier

    return classifier.margin_curriculum_cut(
        _docs(spark, sf_dir),
        keep_pct=_CURR_PCT,
        dim=_CLF_DIM,
        iters=_CLF_ITERS,
    ).orderBy("source", "rk")


# --- grouped hierarchical windows as a first-class query (r4 verdict
# item 2): per-source rank + decile WITHOUT any task holding a whole
# source (operators/windows.py::with_grouped_row_number — range
# partitions on (source, order), per-(pid, source) local windows,
# equality-keyed offsets join).  The decile reproduces SQL NTILE's
# row-split rule exactly (windows.ntile_from_row_number, already pinned
# bit-exact for the global case).

SOURCE_LENGTH_DECILES_SQL = """
WITH s AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents
)
SELECT source, doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk,
       CAST(NTILE(10) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS BIGINT) AS decile
FROM s ORDER BY source, rk
"""


@register(
    "source_length_deciles",
    SOURCE_LENGTH_DECILES_SQL,
    "ext: per-group rank/NTILE via grouped hierarchical windows",
)
def q_source_length_deciles(spark, sf_dir):
    from ..operators.windows import ntile_from_row_number, with_grouped_row_number

    s = _docs(spark, sf_dir).select(
        "source", "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    ranked = with_grouped_row_number(
        s,
        ["source"],
        [("n_chars", False), ("doc_id", True)],
        "rk",
        materialize="checkpoint",  # cheap projected-scan upstream (r11 A/B)
    )
    totals = s.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (
        ranked.join(F.broadcast(totals), "source")
        .select(
            "source",
            "doc_id",
            "n_chars",
            "rk",
            ntile_from_row_number(F.col("rk"), F.col("_n"), 10).alias("decile"),
        )
        .orderBy("source", "rk")
    )


# --- per-source token-budget cut (grouped running sum): take docs in
# deterministic hash-priority order within EACH source until that
# source's token budget is spent — the per-group twin of
# dsir_resampled_mixture's global budget prefix, and the second
# consumer of the grouped hierarchical windows (no task ever holds a
# whole source).  Hash priority = md5 over the doc id (the
# shuffled_corpus_order convention), so the "curriculum" is a
# reproducible uniform draw in both engines.

_SRC_BUDGET = 6_000

SOURCE_TOKEN_BUDGET_SQL = f"""
WITH t AS (
    SELECT source, doc_id,
           md5('budget:' || CAST(doc_id AS VARCHAR)) AS pri,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), ranked AS (
    SELECT source, doc_id, pri, n_tokens,
           CAST(SUM(n_tokens) OVER (
                PARTITION BY source
                ORDER BY pri, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
    FROM t
)
SELECT source, doc_id, n_tokens, cum_tokens
FROM ranked
WHERE cum_tokens - n_tokens < {_SRC_BUDGET}
ORDER BY source, cum_tokens, doc_id
"""


@register(
    "source_token_budget_cut",
    SOURCE_TOKEN_BUDGET_SQL,
    "ext: per-source token-budget prefix via grouped hierarchical running sum",
)
def q_source_token_budget_cut(spark, sf_dir):
    from ..operators.windows import with_grouped_running_sum

    t = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias("pri"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    summed = with_grouped_running_sum(
        t,
        ["source"],
        [("pri", True), ("doc_id", True)],
        "n_tokens",
        "cum_tokens",
        materialize="checkpoint",  # cheap projected-scan upstream (r11 A/B)
    )
    return (
        summed.filter(F.col("cum_tokens") - F.col("n_tokens") < _SRC_BUDGET)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens", "doc_id")
    )


# --- joint multimodal duplicate clusters: the two dedup families
# COMPOSED — a pair of records is duplicate-linked if their TEXT is
# near-identical (MinHash-LSH verified Jaccard >= 0.5) OR their IMAGE
# payload is perceptually near-identical (banded dHash, Hamming <= 3);
# clusters are connected components over the union edge set (min-label
# canonical representative).  This is the image-text corpus curation
# shape: captions get paraphrased while the image is re-encoded, or the
# image is re-cropped while the caption survives verbatim — either link
# alone must pull the pair into one cluster.  Both edge generators are
# the banded (never all-pairs) scale paths; the image edges are
# lossless (Hamming pigeonhole) and the text edges near-lossless
# (MinHash banding recall ~0.9999 at Jaccard exactly 0.5), so the
# brute-force recursive-CTE oracle is exact on corpora free of
# boundary pairs — which the driver corpora are verified to be.

def _multimodal_dup_clusters_sql(max_dist: int) -> str:
    bands = ",\n         ".join(
        f"({_dhash_band_sql(r)}) AS b{r}" for r in range(8)
    )
    ham = " + ".join(f"bit_count(xor(a.b{r}, b.b{r}))" for r in range(8))
    return f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id, CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END AS s
    FROM toks
), tpairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), m AS (
    SELECT doc_id AS media_id, text,
           greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS side
    FROM documents
), h AS (
    SELECT media_id,
           {bands}
    FROM m
), ipairs AS (
    SELECT a.media_id AS id_a, b.media_id AS id_b
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE {ham} <= {max_dist}
), pairs AS (
    SELECT id_a, id_b FROM tpairs UNION SELECT id_a, id_b FROM ipairs
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
), comps AS (
    SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id
)
SELECT doc_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comps ORDER BY doc_id"""


@register(
    "multimodal_dup_clusters",
    _multimodal_dup_clusters_sql(_DHASH_MAX_DIST),
    "ext: joint text+image duplicate clusters (MinHash-LSH OR dHash edges -> CC)",
)
def q_multimodal_dup_clusters(spark, sf_dir):
    from ..operators import components

    docs = _docs(spark, sf_dir)
    tpairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    ipairs = multimodal.image_near_dups(media, max_dist=_DHASH_MAX_DIST).select(
        F.col("media_id_a").alias("id_a"), F.col("media_id_b").alias("id_b")
    )
    edges = tpairs.unionByName(ipairs)  # CC dedups the union internally
    return components.near_dup_clusters(edges).orderBy("doc_id")


# --- hard-negative mining (contrastive-training data prep): per
# anchor, the top-k most-similar corpus vectors with a DIFFERENT label
# (operators/similarity.py::hard_negative_topk).  Same bounded-anchor
# BNLJ shape as ann_cosine_topk (CROSS_OK + build-side pin); null
# labels drop out under SQL <>'s three-valued logic in both engines.

HARD_NEG_SQL = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
     scored AS (
       SELECT q.query_id, e.vec_id, e.label AS neg_label,
              list_dot_product(q.qv, e.v)
                / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(e.v, e.v)) AS cos_sim
       FROM q JOIN e ON e.vec_id <> q.query_id AND e.label <> q.qlabel
     ),
     ranked AS (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, vec_id) AS rank
       FROM scored
     )
SELECT query_id, vec_id, neg_label, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


@register(
    "hard_negative_mining",
    HARD_NEG_SQL,
    "ext: hard-negative mining (top-k nearest with a different label)",
)
def q_hard_negative_mining(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    out = similarity.hard_negative_topk(emb, anchors, k=10)
    return out.withColumn("rank", F.col("rank").cast("int")).orderBy("query_id", "rank")


# --- exact-substring dedup (Lee et al. 2022 duplicated-span removal):
# token positions inside any 5-token run whose exact text occurs in
# >= 2 distinct documents are removed corpus-wide.  No pair join in the
# plan (gram postings -> distinct-doc count -> semi-join back), so the
# Spark side is linear in corpus tokens; the oracle replays the same
# k-gram seed rule with DuckDB md5 == Spark md5 on identical strings.

_SUBSTR_K = 5

EXACT_SUBSTRING_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, pos, md5(array_to_string(t[pos:pos + {_SUBSTR_K - 1}], ' ')) AS g
  FROM toks, unnest(generate_series(1, len(t) - {_SUBSTR_K - 1})) AS u(pos)
  WHERE len(t) >= {_SUBSTR_K}
), dupg AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT doc_id, pos + off AS cp
  FROM grams JOIN dupg USING (g),
       unnest(generate_series(0, {_SUBSTR_K - 1})) AS o(off)
), covagg AS (
  SELECT doc_id, list(cp) AS cps, COUNT(*) AS nd FROM cov GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(coalesce(nd, 0) AS BIGINT) AS n_dup_tokens,
       CASE WHEN len(t) > 0
            THEN CAST(coalesce(nd, 0) AS DOUBLE) / len(t)
            ELSE 0.0 END AS dup_token_ratio,
       coalesce(array_to_string(
         list_filter(t, (x, i) -> NOT coalesce(list_contains(cps, i), FALSE)),
         ' '), '') AS cleaned_text  -- DuckDB: empty list -> NULL; Spark: ''
FROM toks LEFT JOIN covagg USING (doc_id)
ORDER BY doc_id
"""


@register(
    "exact_substring_dedup",
    EXACT_SUBSTRING_SQL,
    "ext: exact duplicated-span removal (Lee et al. 2022, k-gram seeds)",
)
def q_exact_substring_dedup(spark, sf_dir):
    return dedup.exact_substring_dedup(
        _docs(spark, sf_dir), min_tokens=_SUBSTR_K
    ).orderBy("doc_id")


# --- video near-dup: per-frame banded dHash -> video-grain MIN ------
# Completes dedup x {text, image, video}.  Videos synthesized from
# documents (payload = UTF-8 bytes, duration = (doc_id % 4) seconds ->
# 1..4 sampled frames); frame i hashes the payload suffix at byte i
# (deterministic stub demux), so the brute-force all-frame-pairs oracle
# certifies the banded Spark plan exactly, like image_near_dups.

def _video_near_dups_sql(max_dist: int) -> str:
    bands = ",\n         ".join(
        f"({_dhash_band_sql(r, off='idx + ')}) AS b{r}" for r in range(8)
    )
    ham = " + ".join(f"bit_count(xor(a.b{r}, b.b{r}))" for r in range(8))
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n_bytes,
         CAST(least(doc_id % 4,
                    greatest(octet_length(encode(text)) - 1, 0)) AS INT)
             AS last_idx
  FROM documents
), fr AS (
  SELECT media_id, text, idx,
         greatest(1, CAST(floor(sqrt(greatest(0, n_bytes - idx))) AS INT)) AS side
  FROM m, unnest(generate_series(0, last_idx)) AS u(idx)
), h AS (
  SELECT media_id, idx,
         {bands}
  FROM fr
), pairs AS (
  SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
         MIN({ham}) AS mh
  FROM h a JOIN h b ON a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT media_id_a, media_id_b, CAST(mh AS BIGINT) AS min_hamming
FROM pairs WHERE mh <= {max_dist}
ORDER BY media_id_a, media_id_b"""


@register(
    "video_near_dups",
    _video_near_dups_sql(_DHASH_MAX_DIST),
    "ext: video near-dup (per-frame banded dHash -> video-grain min)",
)
def q_video_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("doc_id") % 4) * 1000).cast("long").alias("duration_ms"),
    )
    return multimodal.video_near_dups(
        media, every_ms=1000, max_dist=_DHASH_MAX_DIST
    ).orderBy("media_id_a", "media_id_b")


# --- audio near-dup: banded spectral-stub fingerprints --------------
# Completes dedup x {text, image, video, AUDIO}.  Payloads follow the
# opaque-byte convention (UTF-8 text bytes stand in for waveforms);
# the fingerprint is integer window/band energy comparisons
# (operators/multimodal.py::audio_fingerprint_bands), so the
# brute-force oracle replays it exactly: E(w,b) = sum of bytes at
# stride-8 offset b inside window w, bit = E(w,b) < E(w,(b+1)%8).

def _audio_near_dups_sql(max_dist: int) -> str:
    ham = " + ".join(f"bit_count(xor(a.b{w}, b.b{w}))" for w in range(8))
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN w = {w} THEN band END) AS b{w}" for w in range(8)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
  FROM documents
), eb AS (
  SELECT media_id, w, b,
         CAST(coalesce(list_sum(list_transform(
             range((w*n)//8 + b, ((w+1)*n)//8, 8), i -> ord(text[i+1])
         )), 0) AS BIGINT) AS e
  FROM m, unnest(generate_series(0, 7)) AS uw(w),
          unnest(generate_series(0, 7)) AS ub(b)
), bits AS (
  SELECT a.media_id, a.w,
         SUM(CASE WHEN a.e < c.e THEN 1 << a.b ELSE 0 END) AS band
  FROM eb a JOIN eb c
    ON a.media_id = c.media_id AND a.w = c.w AND c.b = (a.b + 1) % 8
  GROUP BY 1, 2
), h AS (
  SELECT media_id,
         {pivots}
  FROM bits GROUP BY media_id
)
SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
       CAST({ham} AS BIGINT) AS hamming_dist
FROM h a JOIN h b ON a.media_id < b.media_id
WHERE {ham} <= {max_dist}
ORDER BY media_id_a, media_id_b"""


@register(
    "audio_near_dups",
    _audio_near_dups_sql(_DHASH_MAX_DIST),
    "ext: audio near-dup (banded spectral-stub fingerprint LSH)",
)
def q_audio_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return multimodal.audio_near_dups(media, max_dist=_DHASH_MAX_DIST).orderBy(
        "media_id_a", "media_id_b"
    )


# --- per-modality corpus dashboard ----------------------------------
# The source_profile idea at modality grain: one row per modality with
# volume, token, and exact-dup statistics — the at-a-glance health
# check a multimodal curation pipeline reads before spending dedup
# compute.  Modalities synthesized by doc_id % 4 (the testdata carries
# no modality column); all aggregates exact and linear.

MODALITY_PROFILE_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN 'text' WHEN 1 THEN 'image'
              WHEN 2 THEN 'audio' ELSE 'video' END AS modality,
         octet_length(encode(text)) AS n_bytes,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks,
         md5(text) AS fp
  FROM documents
)
SELECT modality,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_payloads,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS exact_dup_items,
       CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*) AS avg_bytes
FROM m GROUP BY modality ORDER BY modality
"""


@register(
    "modality_profile",
    MODALITY_PROFILE_SQL,
    "ext: per-modality corpus dashboard (volume/tokens/exact-dup stats)",
)
def q_modality_profile(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    m = docs.select(
        F.element_at(
            F.array(F.lit("text"), F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 4).cast("int") + 1,
        ).alias("modality"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
        F.md5("text").alias("fp"),
    )
    return (
        m.groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.count_distinct("fp").cast("long").alias("distinct_payloads"),
            (F.count(F.lit(1)) - F.count_distinct("fp"))
            .cast("long")
            .alias("exact_dup_items"),
            (F.sum("n_bytes").cast("double") / F.count(F.lit(1))).alias("avg_bytes"),
        )
        .orderBy("modality")
    )


# --- cross-modal duplicate clusters: ALL FOUR dedup families composed.
# Every record carries four modality renditions (text itself, plus
# image/audio/video payloads derived from its bytes under the repo's
# opaque-payload convention); a pair is duplicate-linked if ANY
# modality matches — text MinHash-LSH Jaccard >= 0.5, image dHash <= 3,
# audio spectral-stub <= 3, or video min-frame dHash <= 3 — and
# clusters are connected components over the union edge set.  Each
# edge generator is its banded (never all-pairs) scale path.  The
# image/audio/video edges are genuinely lossless (Hamming pigeonhole);
# the text edges come from MinHash banding, whose recall at Jaccard
# exactly 0.5 is ~0.9999, not 1 — so the brute-force exact-Jaccard
# oracle can in principle disagree on a borderline pair (P(miss)
# ~1e-4 at the boundary; same pre-existing caveat as
# multimodal_dup_clusters).  The driver corpora are verified free of
# boundary pairs, which is what makes the recursive CTE exact here.

def _crossmodal_dup_clusters_sql(max_dist: int) -> str:
    ibands = ",\n         ".join(f"({_dhash_band_sql(r)}) AS b{r}" for r in range(8))
    iham = " + ".join(f"bit_count(xor(a.b{r}, b.b{r}))" for r in range(8))
    vbands = ",\n         ".join(
        f"({_dhash_band_sql(r, off='idx + ')}) AS b{r}" for r in range(8)
    )
    apivots = ",\n         ".join(
        f"MAX(CASE WHEN w = {w} THEN band END) AS b{w}" for w in range(8)
    )
    return f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id, CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END AS s
    FROM toks
), tpairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), m AS (
    SELECT doc_id AS media_id, text,
           greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS side
    FROM documents
), h AS (
    SELECT media_id,
           {ibands}
    FROM m
), ipairs AS (
    SELECT a.media_id AS id_a, b.media_id AS id_b
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE {iham} <= {max_dist}
), am AS (
    SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
    FROM documents
), eb AS (
    SELECT media_id, w, b,
           CAST(coalesce(list_sum(list_transform(
               range((w*n)//8 + b, ((w+1)*n)//8, 8), i -> ord(text[i+1])
           )), 0) AS BIGINT) AS e
    FROM am, unnest(generate_series(0, 7)) AS uw(w),
             unnest(generate_series(0, 7)) AS ub(b)
), abits AS (
    SELECT a.media_id, a.w,
           SUM(CASE WHEN a.e < c.e THEN 1 << a.b ELSE 0 END) AS band
    FROM eb a JOIN eb c
      ON a.media_id = c.media_id AND a.w = c.w AND c.b = (a.b + 1) % 8
    GROUP BY 1, 2
), ah AS (
    SELECT media_id,
           {apivots}
    FROM abits GROUP BY media_id
), apairs AS (
    SELECT a.media_id AS id_a, b.media_id AS id_b
    FROM ah a JOIN ah b ON a.media_id < b.media_id
    WHERE {iham} <= {max_dist}
), vm AS (
    SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n_bytes,
           CAST(least(doc_id % 4,
                      greatest(octet_length(encode(text)) - 1, 0)) AS INT)
               AS last_idx
    FROM documents
), fr AS (
    SELECT media_id, text, idx,
           greatest(1, CAST(floor(sqrt(greatest(0, n_bytes - idx))) AS INT)) AS side
    FROM vm, unnest(generate_series(0, last_idx)) AS u(idx)
), vh AS (
    SELECT media_id, idx,
           {vbands}
    FROM fr
), vpairs AS (
    SELECT media_id_a AS id_a, media_id_b AS id_b FROM (
      SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
             MIN({iham}) AS mh
      FROM vh a JOIN vh b ON a.media_id < b.media_id
      GROUP BY 1, 2
    ) WHERE mh <= {max_dist}
), pairs AS (
    SELECT id_a, id_b FROM tpairs UNION SELECT id_a, id_b FROM ipairs
    UNION SELECT id_a, id_b FROM apairs UNION SELECT id_a, id_b FROM vpairs
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
), comps AS (
    SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id
)
SELECT doc_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comps ORDER BY doc_id"""


@register(
    "crossmodal_dup_clusters",
    _crossmodal_dup_clusters_sql(_DHASH_MAX_DIST),
    "ext: 4-modality duplicate clusters (text|image|audio|video edges -> CC)",
)
def q_crossmodal_dup_clusters(spark, sf_dir):
    from ..operators import components
    from ..operators.dedup import _scoped_cache

    docs = _docs(spark, sf_dir)
    tpairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")

    # image/audio/video signatures from ONE fused Arrow pass (each
    # record's renditions share the payload bytes, so running the three
    # standalone operators would decode every payload 3+ times); the
    # hashes are bit-identical to the standalone operators, so the
    # oracle SQL below is untouched
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("doc_id") % 4) * 1000).cast("long").alias("duration_ms"),
    )
    sig = _scoped_cache(
        multimodal.multimodal_signatures(media, every_ms=1000), "crossmodal_sig"
    )

    # the three media arms share ONE posting exchange + ONE pair
    # aggregate (r11: multi_arm_hamming_pairs) instead of a banded
    # self-join + dedup per arm — per-arm pair sets are identical by
    # construction (modality-keyed candidates, min over candidate rows),
    # so the union edge set and the oracle SQL are untouched
    mpairs = multimodal.multi_arm_hamming_pairs(
        {
            "image": sig.select("media_id", F.col("image_h").alias("h")),
            "audio": sig.select("media_id", F.col("audio_h").alias("h")),
            "video": sig.select("media_id", F.explode("video_hs").alias("h")),
        },
        _DHASH_MAX_DIST,
    ).select(F.col("media_id_a").alias("id_a"), F.col("media_id_b").alias("id_b"))
    edges = tpairs.unionByName(mpairs)  # CC dedups the union internally
    return components.near_dup_clusters(edges).orderBy("doc_id")


# --- duplicate-cluster representatives: keep-best-per-cluster --------
# The retention step a curation pipeline runs AFTER cluster assembly:
# near_dup_clusters labels groups by min id; the corpus rewrite keeps
# the highest-QUALITY member instead (quality here = alpha-character
# count, an exact BIGINT so the driver hash is engine-independent;
# swap any score relation in the operator).  Ties break to min id.

DUP_REPS_SQL = """
WITH RECURSIVE toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), sh AS (
    SELECT doc_id, CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END AS s
    FROM toks
), pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, comp) AS (
    SELECT s, s FROM (SELECT DISTINCT s FROM edges)
    UNION
    SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
), comps AS (
    SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id
), qual AS (
    SELECT c.doc_id, c.component,
           CAST(length(d.text)
                - length(regexp_replace(d.text, '[a-zA-Z]', '', 'g'))
             AS BIGINT) AS quality
    FROM comps c JOIN documents d USING (doc_id)
), ranked AS (
    SELECT component, doc_id, quality,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY quality DESC, doc_id) AS rn
    FROM qual
)
SELECT component, cluster_size, doc_id AS kept_doc_id, quality AS kept_quality
FROM ranked WHERE rn = 1 ORDER BY component
"""


@register(
    "dup_cluster_representatives",
    DUP_REPS_SQL,
    "ext: keep-best-per-cluster retention (clusters x quality argmax)",
)
def q_dup_cluster_representatives(spark, sf_dir):
    from ..operators import components

    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    clusters = components.near_dup_clusters(pairs)
    qual = docs.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", "[a-zA-Z]", ""))
        )
        .cast("long")
        .alias("quality"),
    )
    return components.cluster_representatives(clusters, qual).orderBy("component")


# --- temperature-based source mixing (alpha = 0.5) --------------------
# Per-source sampling targets ~ sqrt(count): the standard multilingual
# rebalance.  All-integer arithmetic (floor(sqrt) + integer DIV), so
# the targets hash identically across engines and never ride a double
# quotient whose product overflows 2^53 at corpus scale.

TEMPERATURE_MIXTURE_SQL = """
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
), w AS (
    SELECT source, n_docs,
           CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight
    FROM counts
), tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(SUM(weight) AS BIGINT) AS total_w
    FROM w
)
SELECT source, n_docs, weight,
       CAST((total_docs * weight) // total_w AS BIGINT) AS sample_target
FROM w, tot ORDER BY source
"""


@register(
    "temperature_source_mixture",
    TEMPERATURE_MIXTURE_SQL,
    "ext: sqrt-temperature source rebalance (integer-exact targets)",
)
def q_temperature_source_mixture(spark, sf_dir):
    return text.sqrt_temperature_mixture(_docs(spark, sf_dir))


# --- cross-source shingle overlap matrix -------------------------------
# Source-grain containment audit before mixing: shared distinct 3-gram
# count per source pair + containment in basis points (exact integer
# rounding, money.py pattern).  The self-join is keyed on the shingle;
# per-key fanout is bounded by the SOURCE count, so no stop-key cap is
# needed (unlike doc-grain posting joins).

SOURCE_OVERLAP_SQL = """
WITH toks AS (
    SELECT source, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), persh AS (
    SELECT source, unnest(CASE WHEN len(t) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(t)-2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [] END) AS s
    FROM toks
), ssh AS (
    SELECT DISTINCT source, s FROM persh
), sizes AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ssh GROUP BY source
), ov AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS overlap
    FROM ssh a JOIN ssh b ON a.s = b.s AND a.source < b.source
    GROUP BY 1, 2
)
SELECT o.source_a, o.source_b, sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b, o.overlap,
       CAST((o.overlap * 20000 + least(sa.n_sh, sb.n_sh))
            // (2 * least(sa.n_sh, sb.n_sh)) AS BIGINT) AS containment_bp
FROM ov o JOIN sizes sa ON sa.source = o.source_a
          JOIN sizes sb ON sb.source = o.source_b
ORDER BY o.source_a, o.source_b
"""


@register(
    "source_overlap_matrix",
    SOURCE_OVERLAP_SQL,
    "ext: cross-source shingle containment matrix (composition audit)",
)
def q_source_overlap_matrix(spark, sf_dir):
    return dedup.source_shingle_overlap(_docs(spark, sf_dir))


# --- end-to-end training export manifest -------------------------------
# The whole curation-to-training handoff in ONE deterministic
# composition: quality gate -> exact dedup keep-min -> md5 'shuf:'
# training order -> greedy token-budget sharding -> per-shard manifest.
# Every stage is an already-audited operator and every number is
# integer/md5-exact, so the full pipeline replay hashes identically.

TRAINING_EXPORT_SQL = """
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') t FROM documents
), stats AS (
    SELECT doc_id, len(t) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
             / length(text) AS alpha_ratio,
           len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
             / len(t) AS stopword_ratio
    FROM toks
), gated AS (
    SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens
    FROM stats s
    WHERE s.n_tokens >= 20 AND s.n_tokens <= 100000
      AND s.alpha_ratio >= 0.5
      AND s.stopword_ratio >= 0.01 AND s.stopword_ratio <= 0.60
), fp AS (
    SELECT g.doc_id, g.n_tokens,
           md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
    FROM gated g JOIN documents d USING (doc_id)
), kept AS (
    SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fp
    ) WHERE rn = 1
), cum AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (
               ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
    FROM kept
), sharded AS (
    SELECT CAST((cum_tokens - n_tokens) // 5000 AS BIGINT) AS shard_id, n_tokens
    FROM cum
)
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM sharded GROUP BY shard_id ORDER BY shard_id
"""


@register(
    "training_export_manifest",
    TRAINING_EXPORT_SQL,
    "ext: end-to-end export (gate -> dedup -> order -> shard manifest)",
)
def q_training_export_manifest(spark, sf_dir):
    return text.training_export_manifest(
        _docs(spark, sf_dir), shard_token_budget=5_000
    )


# --- span-grain decontamination: scrub eval spans, keep the doc -------
# eval_contamination flags/drops whole docs; this SALVAGES them — the
# exact-substring machinery pointed at the eval suite: train token
# positions inside any verbatim 5-token eval run are cut and the doc
# rebuilt.  Train/test assignment is the deterministic md5 split rule
# (train_split), so the oracle replays the whole composition.

EVAL_SPAN_SCRUB_SQL = """
WITH split AS (
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
), toks AS (
    SELECT d.doc_id, s.split, regexp_split_to_array(trim(d.text), '\\s+') AS t
    FROM documents d JOIN split s USING (doc_id)
), egrams AS (
    SELECT DISTINCT array_to_string(t[pos:pos + 4], ' ') AS g
    FROM toks, unnest(generate_series(1, len(t) - 4)) AS u(pos)
    WHERE split = 'test' AND len(t) >= 5
), tgrams AS (
    SELECT doc_id, pos, array_to_string(t[pos:pos + 4], ' ') AS g
    FROM toks, unnest(generate_series(1, len(t) - 4)) AS u(pos)
    WHERE split = 'train' AND len(t) >= 5
), cov AS (
    SELECT DISTINCT doc_id, pos + off AS cp
    FROM tgrams JOIN egrams USING (g),
         unnest(generate_series(0, 4)) AS o(off)
), covagg AS (
    SELECT doc_id, list(cp) AS cps, COUNT(*) AS nc FROM cov GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(coalesce(nc, 0) AS BIGINT) AS n_contaminated_tokens,
       CASE WHEN len(t) > 0
            THEN CAST(coalesce(nc, 0) AS DOUBLE) / len(t)
            ELSE 0.0 END AS contaminated_ratio,
       coalesce(array_to_string(
         list_filter(t, (x, i) -> NOT coalesce(list_contains(cps, i), FALSE)),
         ' '), '') AS cleaned_text
FROM toks LEFT JOIN covagg USING (doc_id)
WHERE split = 'train'
ORDER BY toks.doc_id
"""


@register(
    "eval_span_scrub",
    EVAL_SPAN_SCRUB_SQL,
    "ext: span-grain decontamination (scrub eval spans, keep the doc)",
)
def q_eval_span_scrub(spark, sf_dir):
    from ..operators import decontam

    docs = _docs(spark, sf_dir)
    split = text.train_split(docs)
    train = docs.join(split.filter(F.col("split") == "train"), "doc_id", "left_semi")
    ev = docs.join(split.filter(F.col("split") == "test"), "doc_id", "left_semi")
    return decontam.eval_span_scrub(train, ev, k=5).orderBy("doc_id")


# --- intra-document repeated-span removal ------------------------------
# The within-page boilerplate case (nav blocks, footers repeated inside
# ONE scraped page): a 5-token run repeated >= 2 times in the SAME
# document keeps its first occurrence and loses the rest — the
# exact-substring machinery with the gram aggregate keyed on
# (doc, gram) and keep-first from a MIN(pos) on the same aggregate.

INTRA_DOC_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, pos, md5(array_to_string(t[pos:pos + {_SUBSTR_K - 1}], ' ')) AS g
  FROM toks, unnest(generate_series(1, len(t) - {_SUBSTR_K - 1})) AS u(pos)
  WHERE len(t) >= {_SUBSTR_K}
), rep AS (
  SELECT doc_id, g, MIN(pos) AS minpos
  FROM grams GROUP BY doc_id, g HAVING COUNT(*) >= 2
), cov AS (
  SELECT DISTINCT grams.doc_id, grams.pos + off AS cp
  FROM grams JOIN rep USING (doc_id, g),
       unnest(generate_series(0, {_SUBSTR_K - 1})) AS o(off)
  WHERE grams.pos <> rep.minpos
), covagg AS (
  SELECT doc_id, list(cp) AS cps, COUNT(*) AS nd FROM cov GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(coalesce(nd, 0) AS BIGINT) AS n_dup_tokens,
       CASE WHEN len(t) > 0
            THEN CAST(coalesce(nd, 0) AS DOUBLE) / len(t)
            ELSE 0.0 END AS dup_token_ratio,
       coalesce(array_to_string(
         list_filter(t, (x, i) -> NOT coalesce(list_contains(cps, i), FALSE)),
         ' '), '') AS cleaned_text
FROM toks LEFT JOIN covagg USING (doc_id)
ORDER BY doc_id
"""


@register(
    "intra_doc_dedup",
    INTRA_DOC_SQL,
    "ext: intra-document repeated-span removal (keep-first)",
)
def q_intra_doc_dedup(spark, sf_dir):
    return dedup.exact_substring_dedup(
        _docs(spark, sf_dir), min_tokens=_SUBSTR_K, scope="doc"
    ).orderBy("doc_id")


# --- reason-carrying quality gate (observability twin) ----------------
# quality_filtered_docs says WHICH docs pass; this says WHY the rest
# fail — pipe-joined failed-rule list in fixed rule order (null-skipping
# concat_ws, engine-independent), the per-rule drop dashboard every
# production crawl gate needs.

QUALITY_REASONS_SQL = """
WITH toks AS (
    SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') t
    FROM documents
), stats AS (
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
             / length(text) AS alpha_ratio,
           len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
             / len(t) AS stopword_ratio
    FROM toks
), r AS (
    SELECT doc_id, n_tokens,
           concat_ws('|',
             CASE WHEN n_tokens < 20 THEN 'too_short' END,
             CASE WHEN n_tokens > 100000 THEN 'too_long' END,
             CASE WHEN alpha_ratio < 0.5 THEN 'low_alpha' END,
             CASE WHEN stopword_ratio < 0.01 THEN 'low_stopword' END,
             CASE WHEN stopword_ratio > 0.60 THEN 'high_stopword' END) AS reasons
    FROM stats
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN reasons = '' THEN 1 ELSE 0 END AS BIGINT) AS passed,
       reasons
FROM r ORDER BY doc_id
"""


@register(
    "quality_gate_reasons",
    QUALITY_REASONS_SQL,
    "ext: reason-carrying quality gate (per-rule drop observability)",
)
def q_quality_gate_reasons(spark, sf_dir):
    return text.quality_gate_reasons(_docs(spark, sf_dir)).orderBy("doc_id")


# --- execute the sqrt-temperature mixture ------------------------------
# temperature_source_mixture computes HOW MANY docs each source should
# contribute; this picks WHICH ones — md5 hash-rank per source (RNG-
# free) via the grouped HIERARCHICAL window (sources are the canonical
# few/LARGE groups; a plain Window.partitionBy(source) is the funnel
# the registry-wide plan gate bans).

TEMPERATURE_SAMPLE_SQL = """
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
), w AS (
    SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight
    FROM counts
), tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(SUM(weight) AS BIGINT) AS total_w
    FROM w
), tgt AS (
    SELECT source, CAST((total_docs * weight) // total_w AS BIGINT) AS sample_target
    FROM w, tot
), ranked AS (
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS pick_rank
    FROM documents
)
SELECT r.doc_id, r.source, r.pick_rank
FROM ranked r JOIN tgt USING (source)
WHERE r.pick_rank <= tgt.sample_target
ORDER BY r.doc_id
"""


@register(
    "temperature_sampled_corpus",
    TEMPERATURE_SAMPLE_SQL,
    "ext: execute the sqrt-temperature mixture (hash-rank pick per source)",
)
def q_temperature_sampled_corpus(spark, sf_dir):
    return text.temperature_sampled_corpus(_docs(spark, sf_dir))


# --- per-source quality-gate dashboard ---------------------------------
# Volume, pass count, per-rule failure counts, and an exact pass rate
# per source — the crawl-operator view of quality_gate_reasons (a doc
# failing two rules counts under both).

SOURCE_QUALITY_SQL = """
WITH toks AS (
    SELECT doc_id, source, text, regexp_split_to_array(trim(text), '\\s+') t
    FROM documents
), stats AS (
    SELECT doc_id, source,
           CAST(len(t) AS BIGINT) AS n_tokens,
           (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))::DOUBLE
             / length(text) AS alpha_ratio,
           len(list_filter(t, x -> list_contains(
               ['the','a','and','of','to','in','is','it','that','for'], lower(x))))::DOUBLE
             / len(t) AS stopword_ratio
    FROM toks
), flags AS (
    SELECT source,
           CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS f_short,
           CASE WHEN n_tokens > 100000 THEN 1 ELSE 0 END AS f_long,
           CASE WHEN alpha_ratio < 0.5 THEN 1 ELSE 0 END AS f_alpha,
           CASE WHEN stopword_ratio < 0.01 THEN 1 ELSE 0 END AS f_lsw,
           CASE WHEN stopword_ratio > 0.60 THEN 1 ELSE 0 END AS f_hsw
    FROM stats
), agg AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_short + f_long + f_alpha + f_lsw + f_hsw = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
           CAST(SUM(f_short) AS BIGINT) AS n_too_short,
           CAST(SUM(f_long) AS BIGINT) AS n_too_long,
           CAST(SUM(f_alpha) AS BIGINT) AS n_low_alpha,
           CAST(SUM(f_lsw) AS BIGINT) AS n_low_stopword,
           CAST(SUM(f_hsw) AS BIGINT) AS n_high_stopword
    FROM flags GROUP BY source
)
SELECT source, n_docs, n_passed, n_too_short, n_too_long, n_low_alpha,
       n_low_stopword, n_high_stopword,
       CAST((n_passed * 20000 + n_docs) // (2 * n_docs) AS BIGINT) AS pass_rate_bp
FROM agg ORDER BY source
"""


@register(
    "source_quality_profile",
    SOURCE_QUALITY_SQL,
    "ext: per-source quality-gate dashboard (rule-level drop counts)",
)
def q_source_quality_profile(spark, sf_dir):
    return text.source_quality_profile(_docs(spark, sf_dir))


# per-source x per-modality JOINT composition dashboard (r7 verdict
# item 7: ``modality_profile`` above slices by modality only; this is
# the two-dimensional matrix completing the curation observability
# set).  Documents stand in for a mixed-modality corpus via the repo's
# opaque-payload convention, with kind assigned deterministically
# (doc_id % 3) so the oracle replicates the synthesis exactly.
# count(distinct md5(payload)) == count(distinct text) because UTF-8
# encoding is injective — the oracle uses the text form directly.
SOURCE_MODALITY_SQL = """
WITH m AS (
    SELECT doc_id, source, text,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS kind
    FROM documents
)
SELECT source, kind,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_payloads,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_exact_dups,
       CAST(SUM(octet_length(encode(text))) AS DOUBLE) / COUNT(*) AS avg_bytes
FROM m GROUP BY source, kind ORDER BY source, kind
"""


@register(
    "source_modality_matrix",
    SOURCE_MODALITY_SQL,
    "ext: per-source x per-modality joint composition dashboard",
)
def q_source_modality_matrix(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return multimodal.modality_profile(media).orderBy("source", "kind")
