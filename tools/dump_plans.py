"""Regenerate PLANS.md: annotated physical plans of headline queries.

Usage: python tools/dump_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

COMMENTARY = {
    "category_kpis": """The flagship 3-way KPI join. Both dimension sides broadcast
(`BroadcastHashJoin` x2, no `SortMergeJoin`), `IsNotNull` filters pushed into the
pruned 5-column parquet scan, partial+final `HashAggregate` around a single
hash-partition exchange, then the presentation sort. `*(n)` spans = whole-stage
codegen.""",
    "purchase_click_attribution": """As-of join as union + last-ignorenulls window:
ONE hash exchange on the key (user_id) instead of an |L|x|R| inequality-join
intermediate; both event scans carry pushed `event_type` filters.""",
    "clicks_in_purchase_windows": """Binned range join: the interval side explodes
onto covered time bins and the join is an equi-join on (bin, user) with the exact
range predicate as the join condition — a hash join, not a nested loop.""",
    "salted_unique_customers": """Skew-safe exact count-distinct: the distinct
stage is sharded by value hash so a hot key splits across 32 bounded partitions;
the final per-key sum moves n_shards rows per key.""",
    "pricing_summary": """TPC-H Q1 shape: pruned 6-column scan feeding partial
`HashAggregate` (map-side combine of every measure), ONE hash exchange on the
2-column group key, final aggregate, presentation sort. No joins; the whole
measure battery rides a single shuffle.""",
    "discount_revenue_opportunity": """TPC-H Q6 shape — the I/O-bound archetype:
date-range, discount-band and quantity predicates ALL pushed to the parquet
reader (row-group statistics skip data before Spark sees it), 4-column pruned
scan, partial agg, single-row exchange, final agg. At 100 TB this plan is
bounded by storage bandwidth, not compute.""",
    "large_quantity_orders": """TPC-H Q18 shape: the heavy per-order aggregation
shuffles lineitem once; the HAVING filter collapses the result to a few keys,
and AQE broadcasts the surviving side against orders and customer — no
sort-merge join anywhere despite joining the two biggest tables.""",
    "top_unshipped_orders": """TPC-H Q3 shape: `ORDER BY revenue DESC LIMIT 10`
compiles to `TakeOrderedAndProject` (per-partition heap + driver merge of 10
rows) — NOT a global range-partition sort. Both selective date filters are
pushed to their parquet scans; customer broadcasts.""",
    "disjunctive_promo_revenue": """TPC-H Q19 shape: the OR of three
(brand, size, quantity) bundles does not defeat pushdown — Catalyst
CNF-extracts the part-only disjunction into the part scan, the
lineitem-only disjunction plus the common `l_returnflag <> 'R'` factor
into the lineitem scan, and keeps the residual OR as the broadcast-join
condition.""",
    "waiting_suppliers": """TPC-H Q21 shape: EXISTS / NOT EXISTS become real
LeftSemi / LeftAnti self-joins on `l_orderkey` with the supplier-inequality
as a join residual; the returnflag filter reaches the scan on both the probe
and anti sides, and the supplier/nation dimension broadcasts.""",
    "nation_market_share": """TPC-H Q8 shape: the per-year market share is a
ratio of two SUMs kept in exact integer ten-thousandths inside ONE
aggregate — the quotient is a single correctly-rounded IEEE division, so
the result is bit-identical to the DuckDB oracle without any ROUND.""",
    "embedding_similar_pairs": """Exact all-pairs cosine as a triangle-blocked
self-join (r2 redesign — r1 collected the corpus to the driver): explode
replicates each vector to its n_blocks block-pairs, ONE hash exchange on the
block-pair id, then `FlatMapGroupsInPandas` scores each block-pair with a
single BLAS matmul and re-emits bit-exact in-order cosines. No broadcast of
the corpus, no driver materialization — O(1) driver memory at any scale.""",
    "minhash_lsh_near_dups": """MinHash-LSH banding: signatures fold inside
`mapInPandas` (zero-shuffle, no explode of shingles), candidates come from a
band-bucket equi-join, and only candidates pay the exact-Jaccard
verification — candidate count scales with near-dups, not corpus^2.""",
    "acctbal_deciles": """Global NTILE without a global window (r3 redesign —
r2 shipped the whole customer table through one WindowExec task): ranks come
from the hierarchical global-row-number primitive (`operators/windows.py` —
range partition, per-partition `row_number`, broadcast triangular offsets),
the table count broadcasts as one row, and the decile is closed-form NTILE
arithmetic on (rank, count). Every exchange is rangepartitioning or a 1-row
broadcast — no `Exchange SinglePartition` feeding a WindowExec.""",
    "context_packing": """Greedy sequential packing is a prefix sum; the r3
plan computes it hierarchically: per-partition running token sums inside
range partitions, then per-partition totals (tiny: one row per partition)
broadcast back as offsets. Same greedy semantics, no single-task stage.""",
    "top_order_percentiles": """`percent_rank`/`cume_dist` as two-pass rank
(r3 redesign): distributed global row_number + a 1-row broadcast total, then
`(rn-1)/(N-1)` and `rn/N` as plain doubles — bit-identical to the window
functions on distinct-ordered input, without moving all orders through one
task.""",
    "hashed_doc_embeddings": """Feature-hashing text->vector: tokenize,
per-token md5 bucket/sign (all built-in exprs), ONE hash exchange on
(doc_id, bucket) for the signed counts. The dense variant used by ANN is
shuffle-free entirely (per-row array expression).""",
    "eval_contamination": """Train/eval decontamination: the eval split's
distinct shingle set (small side) BROADCASTs into a LeftSemi against the
training postings — the corpus is filtered map-side with zero corpus
shuffle; the only data exchange is the per-doc hit aggregate.""",
    "embedding_quantization": """int8 scalar quantization: entirely per-row
array expressions (scale, codes, in-order error fold) — a single scan with
no exchange before the presentation sort. The shape that matters at 100 TB:
quantizing N vectors is exactly one pass over N rows.""",
    "doc_token_ids": """Vocabulary encode: the 256-row vocab relation
broadcasts into the exploded token stream (no corpus shuffle to join),
and each doc reassembles in-order via array_sort of (pos, id) structs in
ONE per-doc aggregate. The only full-width exchange is that aggregate.""",
    "shuffled_corpus_order": """Deterministic global shuffle: md5-keyed
shard assignment then a row_number PARTITIONED by shard — each window task
sorts one shard, never the corpus. At 100 TB n_shards scales with the
corpus so per-task work is constant.""",
    "ann_quantized_topk": """Two-stage quantized ANN: stage 1 scores the
NARROW int8-code relation (1/4 the scan bytes — the quantity that bounds
a 100 TB embedding sweep) with an integer-dot fold; stage 2 joins only
the oversample*k candidates back to full precision for exact cosine —
the bounded candidate list is the broadcast build side (r4: left to
stats the optimizer would broadcast the corpus).""",
    "clicks_before_purchase": """Grouped as-of aggregate (r4): cumulative
count/sum/max over ALL right rows at-or-before each left row — union the
tagged sides, ONE hash exchange on user_id, one sorted cumulative-window
scan. The SQL oracle's LEFT JOIN ON ts<=ts is |P|x|C| per user; this
plan never materializes a pair.""",
    "customer_priority_history": """SCD2 history build (r4): change
compression (lag of the attr struct) and interval stitching (lead) ride
the SAME single hash exchange on o_custkey — two chained WindowExecs, a
pruned 4-column scan, and the presentation sort. Incremental maintenance
(scd2_merge) touches only batch keys via a broadcast anti/semi join.""",
    "keyword_search_topk": """Sparse lexical search (r4): the corpus is
tokenized once and immediately semi-filtered map-side against the
BROADCAST query-term set, so the first shuffle moves only postings of
queried terms; df/idf are aggregates of that narrow relation (the 1-row
corpus count broadcasts), and the per-query top-k moves k rows per
query. Integer idf keeps scoring bit-identical to the DuckDB oracle.""",
    "doc_model_scores": """Batched inference plumbing (r4): a single
mapInPandas stage — the model loads once per PARTITION and scores Arrow
batches; no shuffle at all before the presentation sort. The stand-in
model is exact IEEE arithmetic, so the oracle certifies the full
Python-worker path, not just row counts.""",
    "boilerplate_free_docs": """C4-style corpus boilerplate removal (r4):
spans explode off a 2-column pruned scan; occurrence counting is a
partial+final distinct-count aggregate on the 8-byte span hash (never
the string); removal is an anti-join on that same key (AQE broadcasts
the boilerplate set at this SF — at 100 TB it stays a shuffle-hash
join, which is the design); reassembly is one (doc) aggregate ordering
spans by position. Three linear shuffles, nothing corpus-quadratic.""",
    "dsir_importance_scores": """DSIR domain selection (r4): one feature
explode feeds both the 64-row bucket-weight aggregate (broadcast back,
map-side join) and the (doc, bucket) count; the final per-doc aggregate
is the only corpus-scale shuffle. Integer smoothed weights — the
log-likelihood ratio ordering without cross-engine transcendentals.""",
    "kmeans_centroids": """Distributed exact k-means (r4): the corpus is
NEVER shuffled for assignment — centroids fold into the projection as
one literal array-of-arrays; the update aggregate carries 2·dim
columnar measures, so map-side partials cut the per-iteration exchange
to ≤k rows per partition; driver collects are ≤k rows.  Integer
quantization makes the fit independent of partitioning and engine —
the oracle certifies all three Lloyd's iterations.""",
    "dsir_resampled_mixture": """DSIR mixture cut (r4): importance scores
join token counts on the doc key, then the token-budget cut is a
GLOBAL ordered prefix sum computed hierarchically (range partition on
(-importance, id) → per-partition running sums → broadcast offsets) —
no Exchange SinglePartition anywhere in the plan.""",
    "search_rerank_topk": """Two-stage retrieval (r4): stage 1 is the
keyword-search plan (broadcast term semi-filter, postings-only
shuffles); stage 2 semi-filters the corpus scan by the BROADCAST
bounded candidate-id set, model-scores candidates only in one
mapInPandas stage, and re-ranks k rows per query. The expensive model
never sees the corpus.""",
    "quality_classifier_scores": """Weak-label perceptron (r4): after
training, the learned weights appear INLINE as a literal array inside
`aggregate(zip_with(x, [w0,...,w32], *), ...)` — the scoring plan is a
pure per-row projection with ZERO exchanges beyond the presentation
sort.  Each training iteration (not shown — separate jobs) is one
33-measure HashAggregate whose map-side partials reduce every
partition to a single row.""",
    "kmeans_balanced_sample": """Cluster-balanced coverage sample (r4):
per-cluster top-m runs TWICE as WindowGroupLimit (Partial on the
(pid, cluster) prune, Final after the cluster exchange) — Spark's
rank-limit pushdown keeps each sort bounded to m rows per group; no
cluster's full membership ever converges on one task.""",
    "cms_heavy_hitters": """Count-min sketch (r4): the d x w sketch is
built by a partial+final HashAggregate (<= d*w rows after map-side
combine) and BROADCAST into the probe join; the final top-20 compiles
to `TakeOrderedAndProject`, not a global sort.""",
    "hybrid_rrf_search": """RRF fusion (r4): both rankings carry
WindowGroupLimit (partial BEFORE the query_id exchange, final after),
so only ~k rows per query per system reach the full-outer fusion
join; the fused rank is again WindowGroupLimit-bounded.  The only
cross shape is the free 1-row n_docs broadcast inside the idf
computation.""",
    "value_histogram_quantiles": """Mergeable histogram quantiles (r4):
ONE corpus-sized aggregate (partial+final, group x 128 buckets out);
everything downstream — cumulative window, integer target-rank
selection, edge arithmetic — runs on <= 128 rows per group.  The
BroadcastNestedLoopJoin is the free 1-row (lo, hi) bounds relation.""",
    "bpe_merge_table": """BPE fit (r4): the result plan is a tiny
ExistingRDD scan because training already ran at plan-build — 10
iterations x (pair-count HashAggregate over the CACHED distinct-word
relation + a 1-row argmax collect), the k-means bounded-collect
contract.  The corpus is scanned once ever (word_relation's single
linear shuffle).""",
    "margin_curriculum_cut": """Per-source curriculum cut (r5 rewrite):
the rank routes through the GROUPED hierarchical window — range
partition on (source, margin DESC, id), per-(pid, source) local
Window (every windowspecdefinition carries __w_pid), per-(pid, source)
totals joined back as a BroadcastHashJoin on the source equality key.
No window is partitioned by source alone, so no task ever holds a
source's membership (the r4 funnel).  Quotas are a |sources|-row
broadcast.""",
    "source_length_deciles": """Grouped hierarchical rank + NTILE (r5):
same shape as the curriculum cut — the per-source ROW_NUMBER comes
from per-(pid, source) windows + broadcast offsets; the NTILE is pure
arithmetic on (rank, per-source total), the per-source totals a
broadcast |sources|-row aggregate.""",
    "source_token_budget_cut": """Per-source token-budget prefix (r5):
grouped hierarchical RUNNING SUM — per-(pid, source) partial sums +
broadcast (pid, source) offsets; the budget filter is then a per-row
comparison.  The raw table never enters a per-source window.""",
    "image_near_dups": """Banded perceptual image dedup (r5): dHash
signatures in ONE Arrow mapInPandas pass over the (pre-fanned-out)
payload scan, posting-list probe-key join for candidates (equality
join on (band, key) — never all-pairs; keys are C(6,3) block-triple
combinations, ~33 bits each, the Manku WWW'07 scheme), exact Hamming
re-verify on candidates only.  Pigeonhole makes the banding lossless,
so this banded plan is certified exactly by the brute-force oracle.""",
    "multimodal_dup_clusters": """The two dedup families composed (r5):
text MinHash-LSH verified pairs UNION image dHash banded pairs feed
connected components; below the 1M-edge threshold (r7) the collected
union-find replaces the per-round join/agg/checkpoint loop — the
duplicate graph is broadcast-build-side sized, so the fast path is the
same design call as a broadcast join.""",
    "training_export_manifest": """End-to-end export composition (r7):
gate features, dedup fingerprint, and the md5 shuffle key project in
ONE pass over the corpus text; keep-min-id dedup is a min-of-struct
hash aggregate (no semi-join back); the ordered token prefix sum is
the hierarchical range-exchange shape (never Exchange SinglePartition)
and the shard assignment is pure integer projection on top.""",
    "source_overlap_matrix": """Cross-source containment audit (r7):
one explode+distinct pass pinned in memory feeds both sides of the
shingle-keyed self-join AND the per-source sizes; per-key fanout is
bounded by the SOURCE count (not documents), so the join cannot skew;
sizes join back via two broadcasts.""",
    "semantic_dedup_clusters_lsh": """The 100 TB semantic-dedup path (r8):
Arrow-batched LSH signatures (md5-derived planes, oracle-replicable)
explode to (id, bucket) postings — ids only, vectors do NOT ride the
posting shuffle; the candidate self-join is an equi-join on the bucket
key; verification re-joins the (cached) vector relation per side —
both joins broadcast at test scale — and the boundary-rescored cosine
filter feeds the CC stage.  Work is O(bucket co-occupancy), never
O(n^2) across the corpus.""",
    "source_modality_matrix": """Per-source x per-modality dashboard (r8):
a single pruned scan with the modality CASE riding through, one
partial+final HashAggregate on (source, kind) — count, byte sum, and
a distinct-md5 count (32-char digests, not payloads, ride the distinct
aggregate); no joins, no windows, no UDFs.""",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from real_time_event_driven_data_pipeline_spark.plans.registry import queries_map
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("plans")
    qm = queries_map()
    print(
        """# Physical plans — headline queries (sf0.1, local[32], AQE on)

Generated by `python tools/dump_plans.py`. What to look for, per query,
is annotated above each plan. These are the plans the engine is
*designed* to produce — `tests/test_plans.py` pins the key properties
so regressions fail CI.
"""
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    for name, commentary in COMMENTARY.items():
        df = qm[name](spark, sf_dir)
        df.collect()  # AQE finalizes + codegen-annotates only on execution
        plan = df._jdf.queryExecution().explainString(mode)
        # fold giant literal blobs (e.g. k-means centroid arrays) so the
        # plan stays readable — the structure, not the constants, matters
        plan = re.sub(r"\[\[[-0-9,\[\]]{200,}\]\]", "[[<literal centroid matrix>]]", plan)
        print(f"## {name}\n\n{commentary}\n\n```\n{plan.strip()}\n```\n")


if __name__ == "__main__":
    main()
