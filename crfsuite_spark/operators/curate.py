"""Composed training-corpus curation: the standard LLM data pipeline
(quality filter → exact dedup → MinHash near-dedup → benchmark
decontamination) as ONE declarative DataFrame chain.

This is the end-to-end recipe the individual operators exist for —
C4/Gopher heuristics (Raffel et al. 2020, Rae et al. 2021), SlimPajama/
RefinedWeb-style near-dedup, and the GPT-3 appendix-C n-gram
decontamination protocol — composed so a single action runs the whole
hygiene pass over a corpus.

Shape at 100 TB (each stage keeps the reduction BEFORE the next
stage's shuffle, so the expensive stages see the smallest possible
input):

1. **Quality filter** — pure JVM Column predicates (`c4_keep`), fused
   into the scan stage: zero shuffle, and the usual ~50-70 % web-crawl
   reduction happens before any data moves.
2. **Exact dedup** — one map-side-combined ``groupBy(md5(text))``
   with ``min_by`` (operators/dedup.py): duplicates collapse inside
   each input partition; one candidate row per (partition, digest)
   crosses the single uniform-key shuffle.
3. **Near-dedup** — MinHash-LSH pairs (operators/minhash.py: banded
   candidates, signature-estimate screen, sort-merge-pinned verify),
   then a greedy pairwise drop: a document is removed iff it appears
   as the GREATER id of any ≥-threshold pair (the SlimPajama rule —
   deterministic, no connected components needed, keeps exactly the
   min-id representative of every duplicate chain discovered). The
   drop set joins back ``left_anti`` on the uniform id key — no
   broadcast assumption: at web scale the duplicate fraction is tens
   of percent, far beyond driver memory, and the anti-join
   sort-merge/shuffle-hash spills.
4. **Decontamination** — benchmark n-grams are bounded by definition
   (an eval set), so they broadcast; the corpus side explodes
   map-side and only (id, hit) rows shuffle (operators/
   decontaminate.py). Corpus text never crosses the wire.

Stage ordering is a cost statement: 1 is free, 2 is the cheapest
shuffle, 3 is the expensive one and sees only unique quality
survivors, 4 is map-side again.

The returned frame carries ``pinned_caches`` (the minhash signature
cache) — callers that materialize the result should release them:
``for c in out.pinned_caches: c.unpersist()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurateConfig:
    """Knobs for :func:`curate_corpus`, defaulting to the published
    protocol values (C4 §2.2 thresholds, Jaccard 0.8 near-dup, 13-gram
    decontamination)."""

    # stage 1: C4-style quality heuristics
    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    min_sentences: int = 3
    # stage 3: MinHash-LSH near-dedup
    n_hashes: int = 32
    bands: int = 8
    shingle_size: int = 5
    jaccard_threshold: float = 0.8
    hash_fn: str = "xxhash64"  # "md5_32" for cross-engine parity
    num_partitions: int | None = None
    # stage 4: n-gram decontamination
    contamination_ngram: int = 13
    max_contamination: int = 0


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    config: CurateConfig | None = None,
) -> DataFrame:
    """Run the full curation pass; returns the surviving rows of
    ``docs`` (all columns). ``benchmark=None`` skips decontamination.

    Every stage is deterministic given the inputs, so the whole
    composition is reproducible in another engine — the driver oracle
    (``__spark_entry__.oracle_sql()['ds_curate']``) rebuilds the exact
    chain in DuckDB and the outputs value-hash-match.
    """
    from crfsuite_spark.functions.analysis import c4_keep
    from crfsuite_spark.operators.decontaminate import decontaminate
    from crfsuite_spark.operators.dedup import exact_dedup
    from crfsuite_spark.operators.minhash import minhash_self_pairs

    cfg = config or CurateConfig()

    # 1. quality filter: map-side predicates, fused into the scan
    kept = docs.where(
        c4_keep(
            text_col,
            min_words=cfg.min_words,
            max_words=cfg.max_words,
            min_mean_word_len=cfg.min_mean_word_len,
            max_mean_word_len=cfg.max_mean_word_len,
            min_sentences=cfg.min_sentences,
        )
    )

    # 2. exact dedup: one partial-aggregated min_by shuffle
    uniq = exact_dedup(kept, id_col, text_col)

    # 3. near-dedup: pairwise greedy drop of the greater id
    pairs = minhash_self_pairs(
        uniq,
        id_col,
        text_col,
        n_hashes=cfg.n_hashes,
        bands=cfg.bands,
        shingle_size=cfg.shingle_size,
        jaccard_threshold=cfg.jaccard_threshold,
        num_partitions=cfg.num_partitions,
        hash_fn=cfg.hash_fn,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    out = uniq.join(losers, id_col, "left_anti")

    # 4. decontamination: broadcast benchmark grams, map-side explode
    if benchmark is not None:
        out = decontaminate(
            out,
            benchmark,
            id_col=id_col,
            text_col=text_col,
            bench_text_col=bench_text_col,
            n=cfg.contamination_ngram,
            max_overlap=cfg.max_contamination,
        )

    out.pinned_caches = getattr(pairs, "pinned_caches", [])
    return out
