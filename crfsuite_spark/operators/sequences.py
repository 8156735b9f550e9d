"""Partition-streaming sequence assembly for mapInPandas pipelines.

The reference's C bridge segments rows into sequences by scanning for
changes in consecutive group ids (rcpp_crfsuite.cpp:71-107) — rows must
arrive contiguous and ordered. The Spark equivalent used throughout
this engine:

    df.repartition(N, *key_cols)               # co-locate each sequence
      .sortWithinPartitions(*key_cols, order)  # contiguous + ordered
      .mapInPandas(fn, schema)                 # stream Arrow batches

``iter_sequence_frames`` stitches sequences that straddle Arrow batch
boundaries: it buffers the trailing (possibly incomplete) group of each
batch and prepends it to the next, so ``fn`` always sees whole
sequences. This keeps decode fully streaming — no per-group
``applyInPandas`` call overhead, no global collect — which is what
makes the plan hold at 10^12 turns: work is per-partition, memory is
per-Arrow-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def iter_sequence_frames(
    batches: Iterator[pd.DataFrame], key_cols: list[str]
) -> Iterator[pd.DataFrame]:
    """Yield pandas frames containing only COMPLETE sequences.

    Input batches must be partition-contiguous and sorted by key_cols
    (guaranteed by repartition + sortWithinPartitions upstream). Each
    yielded frame contains one or more whole sequences; the final
    partial group is carried into the next batch.
    """
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        # find the start of the last group; hold it back
        last_key = tuple(pdf.iloc[-1][k] for k in key_cols)
        mask_last = np.ones(len(pdf), dtype=bool)
        for k, v in zip(key_cols, last_key):
            mask_last &= (pdf[k] == v).to_numpy()
        first_of_last = int(np.argmax(mask_last))  # groups are contiguous
        if first_of_last == 0:
            carry = pdf  # whole batch is one (possibly incomplete) group
            continue
        carry = pdf.iloc[first_of_last:].reset_index(drop=True)
        yield pdf.iloc[:first_of_last].reset_index(drop=True)
    if carry is not None and len(carry):
        yield carry


def group_bounds(pdf: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """Start offsets of each sequence in a frame of whole, contiguous,
    sorted groups. Returns int64 offsets of length n_groups+1."""
    n = len(pdf)
    if n == 0:
        return np.array([0], dtype=np.int64)
    diff = np.zeros(n - 1, dtype=bool)
    for k in key_cols:
        col = pdf[k].to_numpy()
        diff |= col[1:] != col[:-1]
    change = np.flatnonzero(diff) + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)
