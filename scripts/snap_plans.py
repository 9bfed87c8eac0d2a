"""Regenerate docs/PLANS.md: physical-plan snapshots for the queries
whose scale design README/COVERAGE claims — rerun after changing any of
them so the documented plans never go stale.

    python scripts/snap_plans.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from airbnb_cdc_spark import queries as q  # noqa: E402
from airbnb_cdc_spark.session import get_spark, release_cached  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# (query, what the plan is evidence of)
SNAPS = [
    (
        "booking_customer_aggregation",
        "flagship O6+A1-A17: broadcast dim join, map-side partial agg, one "
        "Exchange on (country, customer_id) for the exact count-distinct",
    ),
    (
        "lookup_latest_event",
        "O5 latest-per-key: WindowGroupLimit partial top-1 BEFORE the "
        "shuffle (scan-speed dedup), then broadcast left join",
    ),
    (
        "dedup_ngram_jaccard",
        "inverted-index count strategy: per-row hashed sets (no "
        "explode+regroup), broadcast hot-set array_except caps each doc "
        "map-side, struct(id, sz) postings carry sizes through the "
        "in-row C(df,2) pair generation whose count IS the intersection "
        "— three shuffles total, no verify join, no sizes joins",
    ),
    (
        "dedup_minhash_lsh",
        "r16 store re-lead: banding + bucket self-join + exact verify "
        "over the PERSISTED signature table only — the plan reads zero "
        "bytes of documents.parquet (derivation runs once per corpus "
        "via _derive_once)",
    ),
    (
        "decontaminate_vs_benchmark",
        "benchmark shingle set collapses to a ONE-ROW broadcast array; "
        "overlap is array_intersect inside each corpus row — zero corpus "
        "shuffles",
    ),
    (
        "dedup_simhash_cluster",
        "quadratic step confined to DISTINCT fingerprints (groupBy "
        "simhash first), band-blocked self-join, linear assignment join "
        "back to docs",
    ),
    (
        "user_funnel",
        "min-ts chained funnel: per-step aggregations reduce to one row "
        "per user BEFORE joining; final counts in one pass + stack "
        "unpivot",
    ),
    (
        "asof_last_view_before_purchase",
        "as-of join as union + single Exchange + ordered window fill — no "
        "range-join candidate explosion",
    ),
    (
        "trailing_hour_activity",
        "time-range self-join expressed as a RANGE window frame: one "
        "Exchange per user, zero candidate pairs",
    ),
    (
        "corpus_prep_summary",
        "end-to-end corpus prep fused into one plan: quality ratios, "
        "fingerprint, and split bucket are projections over a single "
        "scan; dedup window + packing window are the only wide stages "
        "before the final tiny groupBy",
    ),
    (
        "chunk_dedup_spans",
        "r17 store re-lead: the keeper groupBy and mark-back join read "
        "the shared derive-once chunk table (zero bytes of "
        "documents.parquet in the plan — one tokenize+slice+md5 pass "
        "serves spans/summary/intervals); same keeper semantics, no "
        "all-pairs",
    ),
    (
        "pii_scrub",
        "PII redaction: pure whole-stage-codegen projection (regexp_"
        "extract_all + ordered regexp_replace), zero shuffles, zero UDFs "
        "— scan-speed",
    ),
    (
        "semdedup_pairs",
        "SemDeDup: linear corpus x broadcast-centroid assignment, pair "
        "join hash-partitioned on cid touches only within-cluster pairs "
        "— no corpus self cross-join",
    ),
    (
        "winnow_pairs",
        "winnowing: gram hashes materialized behind the cache barrier "
        "(window-min lambda over an InMemoryRelation column, not an "
        "inlined md5 chain), AUTO-capped postings, fp-keyed self-join "
        "— candidate volume is sum C(df,2) over capped postings",
    ),
    (
        "bloom_semi_join_orders",
        "Bloom runtime filter: the bitset is an ARRAY LITERAL in a "
        "scan-side Filter BELOW the fact's Exchange (survivors-only "
        "shuffle into the verify semi join); r17 — the probe hashes "
        "with native xxhash64 (the verify join makes the result "
        "hash-independent; bloom_mark keeps the oracle-replayable md5)",
    ),
    (
        "zorder_events_layout",
        "Morton layout audit: the interleave is a pure projection over "
        "the scan (unrolled shift/AND/OR in codegen); one metadata-"
        "sized groupBy on the z-file key — no sort, no self-join",
    ),
    (
        "diversity_sample_by_cluster",
        "salted two-phase top-k (r10 shape): bounded row_number window "
        "per (cluster, salt) sub-group — spillable external sort, not "
        "an in-heap collect_list — then the final rank over the tiny "
        "candidate set; no hot-key straggler task",
    ),
    (
        "url_canonical_dedup",
        "URL canonicalization is a pure whole-stage-codegen projection "
        "on the scan (split_part/lower/filter/sort_array chains, zero "
        "Python), followed by ONE hash aggregate on the canonical key",
    ),
    (
        "domain_capped_sample",
        "canonical-domain extraction fused into the scan projection; "
        "per-domain cap via the salted two-window top-k — two bounded "
        "Exchanges, no unbounded per-domain state",
    ),
    (
        "boilerplate_strip",
        "segment explode is a projection; df = distinct + one hash agg "
        "on the segment hash; strip = left_anti on that key; reassembly "
        "agg state bounded by each doc's own text — chunk dedup's "
        "shuffle budget",
    ),
    (
        "bm25_topk",
        "term IN-list filter INSIDE the token array before the explode "
        "(hits-only fan-out); one partial+final tf hash agg; single-row "
        "broadcast stats/dfs; TakeOrderedAndProject cut — never a "
        "global sort",
    ),
    (
        "quality_filter_chain",
        "every quality signal from ONE tokenize in ONE codegen "
        "projection over the scan — zero exchanges",
    ),
    (
        "semantic_decontam",
        "eval block broadcast; corpus scanned once through the "
        "quantized-cosine BroadcastNestedLoopJoin; only exchange feeds "
        "the best-match window over the thresholded hit set",
    ),
    (
        "length_bucket_stats",
        "projection + a |buckets|-row partial/final hash aggregate — "
        "scan-speed",
    ),
    (
        "dsir_select",
        "target/source bucket models are n_buckets-row aggregates; the "
        "dense score table broadcasts into candidate scoring (explode → "
        "BroadcastHashJoin → doc-key partial agg); TakeOrdered cut — "
        "the corpus shuffles once, on the doc key",
    ),
    (
        "vocab_coverage",
        "one map-combined groupBy(token) is the only corpus-scale "
        "exchange; rank/cumsum window and the size join run on the "
        "metadata-sized vocab table (broadcast both sides)",
    ),
    (
        "temperature_mixture",
        "groups-sized aggregate, then pure integer arithmetic + a "
        "broadcast of the 1-row total — the apportionment window sorts "
        "the tiny group frame, never the corpus",
    ),
    (
        "returned_item_revenue",
        "returnflag/date filters pushed into both parquet scans "
        "(PushedFilters), nation BroadcastHashJoin, partial agg before "
        "the group exchange, TakeOrderedAndProject top-20",
    ),
    (
        "important_parts_share",
        "global total as a 1-row broadcast into the HAVING; r17 — the "
        "partkey aggregate is persisted so the total and the HAVING "
        "branch share ONE lineitem scan; part dim broadcast into the "
        "final enrich",
    ),
    (
        "keep_best_quality",
        "component frame broadcast into the mark-back; keeper argmax "
        "through the salted two-phase top-1 (both stages sort-based "
        "windows, no per-group array state)",
    ),
    (
        "source_quality_profile",
        "chain carries the source key through ONE codegen projection "
        "(no corpus self-join); two map-combined groupBys to "
        "sources-sized frames",
    ),
    (
        "bilateral_trade_volume",
        "nation dim broadcast TWICE under supplier/customer aliases; "
        "ship-date range in the lineitem PushedFilters; nation-pair "
        "predicate applied before the group exchange",
    ),
    (
        "semdedup_keep_canonical",
        "cluster-blocked pair generation (never all-pairs) feeding a "
        "broadcast anti-join apply — the embedding corpus is never "
        "shuffled",
    ),
    (
        "lm_quality_score",
        "candidate scan with the source filter PUSHED; the dense "
        "n_buckets^2 model (Range join over two map-combined "
        "aggregates, target scanned once) broadcast into the "
        "transition-exploded candidates; one doc-key Exchange; "
        "TakeOrderedAndProject cut",
    ),
    (
        "components_store_apply",
        "store-backed apply: the component store read is a "
        "metadata-sized parquet scan broadcast into one anti-join + "
        "one flag join against a single corpus scan — no pair "
        "re-derivation anywhere in the plan",
    ),
    (
        "supplier_wait_chain",
        "Q21 decorrelated: ONE lineitem scan, per-(order,supplier) "
        "groupBy, per-order stats as stacked windows sharing the "
        "orderkey sort, supplier dim broadcast, TakeOrdered cut — "
        "three exchanges total, no self-join",
    ),
    (
        "bracket_revenue",
        "Q19 disjunction: PushedFilters on BOTH scans carry the "
        "derived hulls AND the per-side OR legs; broadcast part join, "
        "one brand-key exchange",
    ),
    (
        "market_share_by_year",
        "Q8 one-pass conditional share: filtered part broadcast first, "
        "date range pushed into the orders scan, every dim broadcast, "
        "single year-key exchange carrying both CASE-sums",
    ),
    (
        "cheapest_supplier_per_part",
        "Q2 argmin decorrelated: pair-key exchange for offers, then ONE "
        "partkey exchange serving both the window MIN and the winner "
        "groupBy — no join-back, no third exchange",
    ),
    (
        "ann_topk_sq8",
        "r16 store re-lead: queries quantize with the STORED scale and "
        "broadcast; the corpus side is one codes-only scan of the "
        "persisted SQ8 table — no float embedding materialized",
    ),
    (
        "ann_topk_ivf_sq8",
        "IVF x SQ8 composition: broadcast centroid assignment/probing "
        "on the persisted quant frame, probed lists joined to SQ8 "
        "codes, integer-dot scoring, windowed top-k",
    ),
    (
        "ppl_bucket_assign",
        "frozen-threshold bucket assignment: language-count-sized "
        "threshold table broadcast into one mark-back projection over "
        "the persisted scored frame — no rank carried over the corpus",
    ),
    (
        "ann_topk_pq",
        "r16 store re-lead (IndexRefineFlat): ADC shortlist from the "
        "STORED code table (m bigint codes per vector, no encode per "
        "run), then the refine stage re-scores only the broadcast "
        "shortlist against one float corpus scan — no corpus shuffle "
        "in the refine",
    ),
    (
        "content_chunk_dedup",
        "content-defined chunk dedup (registered r14): zero-shuffle "
        "per-row Rabin-rule chunking fused into the scan, one "
        "chunk-hash groupBy, one same-key mark-back join",
    ),
]


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# Physical plan snapshots (sf0.01, AQE on)",
        "",
        "Generated by `python scripts/snap_plans.py` — the evidence for the",
        "scale-design claims in README/COVERAGE: pushed filters, pruned",
        "scans, broadcast joins, map-side partial aggregation, window group",
        "limits, and the absence of unbounded candidate joins.",
        "",
    ]
    for name, why in SNAPS:
        df = q.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()
        release_cached()
        out += [f"## {name}", "", f"_{why}_", "", "```", buf.getvalue().rstrip(), "```", ""]
    (REPO / "docs" / "PLANS.md").write_text("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(SNAPS)} plans)")


if __name__ == "__main__":
    main()
