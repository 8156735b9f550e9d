"""Byte-pair-encoding vocabulary induction and tokenization.

Implements the word-level BPE of Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units"): pre-tokenize to
whitespace words, represent each word as its character sequence plus an
end-of-word marker, then greedily merge the most frequent adjacent
symbol pair ``num_merges`` times. Tokenization applies the learned
merges in rank order (lowest rank first) — the standard BPE inference
rule, identical for seen and unseen words.

Scale shape (what makes this work at 100 TB):

- **Training input is the word HISTOGRAM, not the corpus.** The only
  corpus-wide job is ``groupBy(word).count()`` — map-side combined,
  output bounded by the distinct-word vocabulary (Heaps' law: ~10^6-10^7
  types even for multi-TB corpora, and ``min_freq`` prunes the long
  tail before collect). The merge loop itself runs on the collected
  (word, freq) table on the driver — exactly how reference BPE trainers
  (subword-nmt, HuggingFace tokenizers) operate; distributing the loop
  would shuffle per-iteration for a table that fits in one task.
  A ``max_words`` guard refuses to collect an unbounded histogram.
- **Tokenization is a scan-local Arrow pass**: one ``pandas_udf`` with
  the merge ranks broadcast once per executor and a per-batch
  word→pieces memo — each distinct word in a batch is segmented once
  regardless of its frequency (the same word-level cache real
  tokenizers use). No shuffle; the corpus text never moves.

Determinism: the merge loop tie-breaks (freq desc, then lexicographic
pair), so the learned vocabulary is a pure function of the histogram —
stable under partitioning, retries, and engine swaps. The histogram is
fully DuckDB-oracle-able; the iterative merge loop is checked by
exact-parity pytest against an independent pure-Python reference
(tests/test_bpe.py) and a rows-only driver check (the documented
weaker gate for iterative algorithms).

Relation to the reference: bnosac/crfsuite consumes pre-tokenized
input (R/crf.R tokenises upstream via udpipe); a transcript-scale
pipeline must induce its own subword vocabulary for token budgeting
and packing (operators/sampling.py:pack_documents), which is this
module.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from crfsuite_spark.functions.analysis import _tokens

#: end-of-word marker appended to each word's final character symbol
EOW = "</w>"


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """(word, freq) over lowercased whitespace words — ONE map-side
    combined groupBy; output bounded by the distinct vocabulary, rows
    below ``min_freq`` pruned post-aggregation."""
    toks = F.filter(
        _tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )
    out = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if min_freq > 1:
        out = out.where(F.col("freq") >= int(min_freq))
    return out


@dataclass
class BPEModel:
    """Learned merge table. ``merges[i]`` is the rank-i pair (a, b) →
    merged symbol ``a + b``; ``ranks`` is the lookup dict tokenizers
    use. Plain strings end in :data:`EOW` on the final symbol."""

    merges: list[tuple[str, str]]
    ranks: dict[tuple[str, str], int] = field(init=False, repr=False)

    def __post_init__(self):
        self.ranks = {p: i for i, p in enumerate(self.merges)}

    def to_frame(self, spark) -> DataFrame:
        """Persistable (rank, left, right) frame."""
        return spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(self.merges)],
            "rank int, left string, right string",
        )

    @classmethod
    def from_frame(cls, df: DataFrame) -> "BPEModel":
        rows = df.select("rank", "left", "right").collect()
        rows.sort(key=lambda r: r["rank"])
        return cls([(r["left"], r["right"]) for r in rows])


def _word_symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace every adjacent occurrence of ``pair``, left to right
    (after a merge the scan resumes AFTER the merged symbol — the
    subword-nmt convention, so 'aaa' + (a,a) → ('aa','a'))."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 1,
    min_pair_freq: int = 2,
    max_words: int = 1_000_000,
) -> BPEModel:
    """Learn ``num_merges`` BPE merges from the corpus.

    One distributed histogram job; the merge loop runs on the collected
    (word, freq) table. Stops early when the best pair's weighted
    frequency drops below ``min_pair_freq`` (merging hapax pairs only
    memorizes noise). Raises if the pruned histogram exceeds
    ``max_words`` rows — raise ``min_freq`` (the scale-correct knob)
    rather than the cap."""
    hist = word_histogram(df, text_col, min_freq)
    # bounded-collect guard folded into the ONE histogram job: pull at
    # most max_words+1 rows — a separate count() probe would run the
    # corpus-wide aggregation twice
    rows = hist.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"word histogram exceeds max_words={max_words}; "
            "raise min_freq to prune the tail before collecting"
        )
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(r["word"]): r["freq"] for r in rows if r["word"]
    }
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # deterministic: max freq, then lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_freq:
            break
        merges.append(best)
        vocab = {
            _merge_word(syms, best): freq for syms, freq in vocab.items()
        }
    return BPEModel(merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE inference: repeatedly merge the LOWEST-RANK adjacent
    pair present — reproduces the training segmentation for seen words
    and extends canonically to unseen ones."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Append ``out_col``: the BPE piece sequence of ``text_col``.

    Arrow-batched ``pandas_udf`` (never per-row Python rows), merge
    ranks captured in the closure (broadcast once per executor by
    Spark's task serialization — the table is num_merges entries), and
    a per-batch word→pieces memo so each distinct word is segmented
    once per batch. Scan-local: zero Exchange (plan-asserted in
    tests/test_bpe.py).

    Pre-tokenization matches :func:`word_histogram` exactly: ASCII
    ``\\s+`` split (``re.ASCII`` — Java's default ``\\s`` is
    ASCII-only too), NOT ``str.split()``, whose Unicode whitespace
    rule would fragment words the histogram trained as one type
    (e.g. around NBSP) and leave learned merges unreachable."""
    import re

    ranks = dict(model.ranks)
    ws = re.compile(r"\s+", re.ASCII)

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in ws.split(text.lower().strip()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, encode(F.col(text_col)))
