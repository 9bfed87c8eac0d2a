"""On-cluster BPE tokenizer construction (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — the word-level merge loop; GPT-2/LLaMA tokenizers are the
byte-level refinement of the same algorithm). Real pretraining
pipelines fit their tokenizer on (a sample of) the training corpus —
at 100 TB that fit is itself a distributed job, and this module is
that job expressed Spark-first.

The algorithm is inherently ITERATIVE — each merge changes the pair
statistics the next merge counts — so, like ``connected_components``
and ``pagerank_quantized`` (operators/graph.py), the loop runs on the
driver while ALL data work stays distributed:

- one map-side-combined pair-count aggregation per merge step
  (the ``bigram_counts`` shape over the CURRENT token sequences);
- ONE ROW collected per step — the argmax pair under the total order
  (count desc, left asc, right asc). That row IS the model update
  (the merge-rule table is metadata by construction: k rules after k
  steps), the same bounded-driver-metadata contract as the union-find
  edge list and the IVF probe ids;
- merge application is a PURE CATALYST expression: a left-to-right
  greedy fold (``F.aggregate``) over each token array that joins
  adjacent (left, right) occurrences non-overlapping, exactly the
  textbook BPE apply. No Python touches a row.
- lineage is truncated with ``localCheckpoint`` every few steps —
  k nested fold expressions would otherwise stack into one
  ever-deeper plan (the connected_components discipline).

Determinism: counts are exact integers, the argmax tie-break is the
full (count, left, right) sort key, and the greedy fold is
order-defined — the fitted rule table and the tokenization are
bit-identical on any partitioning and any engine. Merged tokens are
space-joined ("a b" + "c" → "a b c"), so a rule's parts remain
recoverable and no artificial separator can collide with input
tokens (the tokenizer splits on whitespace, so raw tokens never
contain spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import tokens
from airbnb_cdc_spark.session import ensure_parallelism

CHECKPOINT_EVERY = 4


def _adjacent_pair_counts(tok_arrays: DataFrame) -> DataFrame:
    """(left, right, c) counts of adjacent token pairs over the
    current sequences — zip_with(slice, slice) so the array is only a
    whole-row argument (the per-element-lambda inlining trap)."""
    n = F.size("toks")
    pairs = F.zip_with(
        F.slice("toks", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        tok_arrays.select(F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _apply_merge(arr, left: str, right: str, merged: str):
    """Left-to-right greedy non-overlapping merge of adjacent
    (left, right) into ``merged`` — the BPE apply step as one
    ``F.aggregate`` fold. The accumulator holds the output array plus
    the one pending token; ``finish`` flushes the pending slot."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        take = (acc.prev == F.lit(left)) & (x == F.lit(right))
        return F.when(
            acc.prev.isNull(),
            F.struct(acc.out.alias("out"), x.alias("prev")),
        ).otherwise(
            F.when(
                take,
                F.struct(
                    F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc.out, F.array(acc.prev)).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    return F.aggregate(
        arr,
        acc0,
        step,
        lambda acc: F.when(acc.prev.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.prev))
        ),
    )


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
) -> list[tuple[int, str, str, str]]:
    """Fit ``n_merges`` BPE merge rules on the corpus; returns the
    ordered rule list [(rank, left, right, merged), ...] — the
    tokenizer MODEL, metadata-sized by construction. Stops early when
    no pair reaches ``min_count`` (nothing left worth merging).

    Per step: one distributed pair-count aggregation + a 1-row argmax
    collect + one fold-expression re-tokenization. The corpus is
    re-tokenized incrementally (each step's fold runs over the
    previous step's arrays), with lineage checkpointed every
    ``CHECKPOINT_EVERY`` steps."""
    cur = ensure_parallelism(df).select(tokens(F.col(text_col)).alias("toks"))
    cur = cur.localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        top = (
            _adjacent_pair_counts(cur)
            .filter(F.col("c") >= min_count)
            .orderBy(F.col("c").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0].left, top[0].right
        merged = f"{left} {right}"
        rules.append((rank, left, right, merged))
        cur = cur.select(_apply_merge(F.col("toks"), left, right, merged).alias("toks"))
        if (rank + 1) % CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
    return rules


def bpe_apply(
    df: DataFrame,
    rules: list[tuple[int, str, str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a fitted rule list: whitespace pre-tokenization,
    then each merge rule applied in rank order (the order is the
    algorithm — later rules may consume earlier rules' outputs). Each
    rule is one fold expression; the rule table is tokenizer-sized
    (k rules), so the whole apply is a per-row projection that fuses
    into any scan — zero shuffles, zero Python."""
    arr = tokens(F.col(text_col))
    for _, left, right, merged in sorted(rules):
        arr = _apply_merge(arr, left, right, merged)
    return df.select(*df.columns, arr.alias(out_col))
