"""Batched Viterbi decode over transcript-scale token tables.

The Spark re-architecture of ``predict.crf`` (reference
R/modelling.R:278-311 → src/rcpp_crfsuite.cpp:176-255 → crf1d_tag.c):

- model weights loaded driver-side and **broadcast** as dense numpy
  (the analogue of the mmap'd model + CQDB, crf1d_model.c);
- ``repartition(N, *seq_cols)`` + ``sortWithinPartitions`` co-locates
  and orders each sequence — the distributed version of the
  consecutive-group-scan contract (rcpp_crfsuite.cpp:198-242).
  Because a sequence is one *turn* (key = conv_id, turn_idx), hot
  conversations with millions of turns hash-spread across all
  partitions — this is the conv_id-salting the north rule demands,
  with zero correctness impact since turns are independent sequences;
- ``mapInPandas`` streams Arrow batches per partition, stitches
  boundary-straddling sequences (operators/sequences.py), maps
  attribute strings → ids with a vectorized pandas lookup (unknown
  attrs dropped, crfsuite.hpp:403-410), and runs the **batched** numpy
  Viterbi (K9) + optional forward-backward marginals (K6/K11) over
  padded [B, T_max, L] tensors — no per-row Python anywhere.

Memory is bounded by the Arrow batch size × T_max; long sequences are
processed in their own padded tensor bucket to avoid padding blow-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crfsuite_spark.kernel import crf
from crfsuite_spark.train.model import CRFModel


def _decode_frame(
    pdf: pd.DataFrame,
    bounds: np.ndarray,
    sorted_h: np.ndarray,
    row_of_slot: np.ndarray,
    state_w: np.ndarray,
    trans_w: np.ndarray,
    labels: np.ndarray,
    attrs_col: str,
    with_marginal: bool,
    emb_w: np.ndarray | None = None,
    embeddings_col: str | None = None,
) -> pd.DataFrame:
    """Decode one frame of whole sequences; returns label (+marginal,
    +seq_logprob) columns aligned with pdf rows. Attributes arrive as
    int64 xxhash64 values (hashed JVM-side) and resolve to model rows
    via binary search on the model's sorted hash table — unknown
    attributes miss and are dropped (crfsuite.hpp:403-410)."""
    A, L = state_w.shape
    N = len(pdf)
    lengths = np.diff(bounds)
    B = len(lengths)
    attr_lists = pdf[attrs_col].to_numpy()
    counts = np.fromiter((len(x) for x in attr_lists), dtype=np.int64, count=N)
    if N and counts.sum():
        flat = np.concatenate(list(attr_lists)).astype(np.int64, copy=False)
    else:
        flat = np.empty(0, dtype=np.int64)
    tok_of_aid = np.repeat(np.arange(N), counts)
    # K1: state scores per token
    S = np.zeros((N, L), dtype=np.float64)
    if len(flat) and len(sorted_h):
        pos = np.searchsorted(sorted_h, flat)
        pos_c = np.minimum(pos, len(sorted_h) - 1)
        known = sorted_h[pos_c] == flat
        if known.any():
            np.add.at(
                S, tok_of_aid[known], state_w[row_of_slot[pos_c[known]]]
            )
    if emb_w is not None and embeddings_col is not None:
        E = np.concatenate(
            [np.asarray(v, dtype=np.float64) for v in pdf[embeddings_col]]
        ).reshape(N, -1)
        S += E @ emb_w
    cols = viterbi_outputs(S, lengths, trans_w, labels, with_marginal)
    out = pd.DataFrame(index=pdf.index)
    for name, vals in cols.items():
        out[name] = vals
    return out


# padded-positions budget per Viterbi tensor (cells = B * T_max; bytes
# ≈ cells * L * 8 * ~3 incl. DP arrays). One pathological long turn in
# a batch of short ones would otherwise inflate the padding for ALL of
# them: 20k sequences padded to a single 5k-token straggler is a 6 GB
# tensor. Length-bucketing below keeps every tensor under the budget
# with bit-identical output (sequences are independent).
_PAD_CELL_BUDGET = 2_000_000


def viterbi_outputs(
    S: np.ndarray,
    lengths: np.ndarray,
    trans_w: np.ndarray,
    labels: np.ndarray,
    with_marginal: bool,
    with_ids: bool = False,
) -> dict[str, np.ndarray]:
    """Pad concatenated per-token state scores ``S`` [N, L] into the
    [B, T_max, L] tensor, run the batched Viterbi (K9) and optional
    marginals/seq-prob (K6/K10/K11), and return flat per-token output
    columns. Shared by the canonical attrs-column decode above and the
    fused zero-shuffle decode (decode/fused.py) so both paths stay
    numerically single-sourced. Batches whose padded area exceeds
    ``_PAD_CELL_BUDGET`` are split into length-sorted buckets, each
    padded to its own T_max — same results, bounded memory."""
    N, L = S.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    B = len(lengths)
    T_all = int(lengths.max()) if B else 0
    if B and B * T_all > _PAD_CELL_BUDGET and B > 1:
        starts = np.zeros(B, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        order = np.argsort(lengths, kind="stable")
        out: dict[str, np.ndarray] = {}
        lo = 0
        while lo < B:
            # grow the bucket while area stays under budget (ascending
            # lengths: the bucket's T_max is its last member's length)
            hi = lo + 1
            while (
                hi < B
                and (hi + 1 - lo) * int(lengths[order[hi]]) <= _PAD_CELL_BUDGET
            ):
                hi += 1
            sel = order[lo:hi]
            lens_b = lengths[sel]
            # token indices of the bucket's sequences, in bucket order
            tok_sel = (
                np.repeat(starts[sel] - np.concatenate(([0], np.cumsum(lens_b[:-1]))), lens_b)
                + np.arange(int(lens_b.sum()))
            )
            res = viterbi_outputs(
                S[tok_sel], lens_b, trans_w, labels, with_marginal, with_ids
            )
            for k, v in res.items():
                if k not in out:
                    out[k] = np.empty(N, dtype=v.dtype)
                out[k][tok_sel] = v
            lo = hi
        return out
    starts = np.zeros(B, dtype=np.int64)
    if B > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    seq_of_tok = np.repeat(np.arange(B), lengths)
    pos_in_seq = np.arange(N) - starts[seq_of_tok]
    T_max = T_all
    state = np.zeros((B, T_max, L), dtype=np.float64)
    state[seq_of_tok, pos_in_seq] = S
    # K9 batched Viterbi
    paths = crf.viterbi_batch(state, trans_w, lengths)
    flat_labels = paths[seq_of_tok, pos_in_seq]
    out = {"label": labels[flat_labels]}
    if with_ids:
        out["label_id"] = flat_labels.astype(np.int64)
    if with_marginal:
        p_state, _, log_norm = crf.marginals_batch(state, trans_w, lengths)
        out["marginal"] = p_state[seq_of_tok, pos_in_seq, flat_labels]
        # K10 sequence probability: exp(score(path) - lognorm)
        path_state = S[np.arange(N), flat_labels]
        score = np.zeros(B)
        np.add.at(score, seq_of_tok, path_state)
        adj = seq_of_tok[1:] == seq_of_tok[:-1] if N > 1 else np.zeros(0, dtype=bool)
        if adj.any():
            tr = trans_w[flat_labels[:-1][adj], flat_labels[1:][adj]]
            np.add.at(score, seq_of_tok[1:][adj], tr)
        out["seq_prob"] = np.exp(score - log_norm)[seq_of_tok]
    return out


def decode(
    tokens: DataFrame,
    model: CRFModel,
    seq_cols: list[str],
    order_col: str,
    attrs_col: str = "attrs",
    with_marginal: bool = True,
    num_partitions: int | None = None,
    passthrough_cols: list[str] | None = None,
    embeddings_col: str | None = None,
    max_seq_len: int | None = None,
    overlap: int = 16,
    attrs_hashed: bool = False,
) -> DataFrame:
    """Viterbi-tag every sequence; returns token rows + label
    [+ marginal + seq_prob]. ``embeddings_col``: optional array<double>
    real-valued attribute column scored against the model's emb_w
    (reference embeddings path, R/modelling.R:278-301).

    ``max_seq_len``: hot-skew safety valve. Sequences longer than the
    cap are split into chunks of that length, each decoded with
    ``overlap`` extra context tokens on both sides; every row's label
    is taken from its OWN chunk (the overlap rows exist only to warm
    the Viterbi lattice at the boundary). This bounds padded-tensor
    memory for a pathological million-token sequence and keeps one hot
    sequence from pinning a partition. Exact for label chains whose
    Viterbi influence horizon is shorter than ``overlap`` (in practice
    all NER-style chains); requires ``order_col`` to be dense 0-based
    within a sequence. Marginals/seq_prob of split sequences are
    per-chunk quantities.

    ``attrs_hashed``: the attrs column is already ``array<bigint>``
    produced by ``cbind_attribute_hashes`` — skip the string hashing
    and resolve against the model's pair-basis hash table."""
    from crfsuite_spark.operators.sequences import group_bounds, iter_sequence_frames

    spark = tokens.sparkSession
    sc = spark.sparkContext
    n_part = num_partitions or sc.defaultParallelism
    reserved = {attrs_col, "label", "marginal", "seq_prob"}
    passthrough = passthrough_cols or [
        c for c in tokens.columns if c not in reserved
    ]
    # the partition key and sort column must survive the projection
    passthrough = list(dict.fromkeys([*seq_cols, order_col, *passthrough]))
    sorted_h, row_of_slot = model.attr_hash_table(
        spark, basis="pair" if attrs_hashed else "string"
    )
    bc = sc.broadcast(
        (
            sorted_h,
            row_of_slot,
            model.state_w,
            model.trans_w,
            np.array(model.labels, dtype=object),
            model.emb_w if embeddings_col else None,
        )
    )
    if max_seq_len:
        # the chunk-ownership marker travels through the UDF with the row
        passthrough = [*passthrough, "__own"]
    types = {f.name: f.dataType.simpleString() for f in tokens.schema.fields}
    types["__own"] = "boolean"
    out_schema = ", ".join(f"`{c}` {types[c]}" for c in passthrough)
    out_schema += ", label string"
    if with_marginal:
        out_schema += ", marginal double, seq_prob double"

    def run(batches):
        sorted_h, row_of_slot, state_w, trans_w, labels, emb_w = bc.value
        for pdf in iter_sequence_frames(batches, ["__seq"]):
            bounds = group_bounds(pdf, ["__seq"])
            res = _decode_frame(
                pdf, bounds, sorted_h, row_of_slot, state_w, trans_w,
                labels, attrs_col, with_marginal,
                emb_w=emb_w, embeddings_col=embeddings_col,
            )
            yield pd.concat([pdf[passthrough], res], axis=1)

    # hash the attribute strings BEFORE the repartition: the shuffle and
    # the Arrow hop move fixed-width int64 arrays, not feature strings
    # (~2.7x smaller at the default template set). __seq collapses the
    # (possibly string-typed) sequence key to one int64 so the Python
    # side detects group boundaries with integer compares instead of
    # object-array equality; rows arrive sorted by the real key, so the
    # hash only ever acts as an equality check between neighbours.
    if attrs_hashed:
        hashed = F.col(attrs_col)
    else:
        hashed = F.expr(
            f"transform(`{attrs_col}`, a -> xxhash64(a))"
        ).alias(attrs_col)
    extra = [embeddings_col] if embeddings_col and embeddings_col not in passthrough else []
    if max_seq_len:
        core = int(max_seq_len)
        o = int(overlap)
        own = F.floor(F.col(order_col) / core)
        pos = F.col(order_col) % core
        # each row decodes in its own chunk; rows near a boundary also
        # feed the neighbouring chunk's lattice as context
        chunk_ids = F.array_compact(F.array(
            own,
            F.when(pos < o, own - 1),
            F.when(pos >= core - o, own + 1),
        ))
        base_cols = [c for c in passthrough if c != "__own"]
        split = (
            tokens.select(*base_cols, *extra, hashed)
            .withColumn("__chunk", F.explode(chunk_ids))
            .where(F.col("__chunk") >= 0)
            .withColumn("__own", (own == F.col("__chunk")).cast("boolean"))
        )
        seq_hash = F.xxhash64(*seq_cols, "__chunk").alias("__seq")
        ordered = (
            split.select(*split.columns, seq_hash)
            .repartition(n_part, *seq_cols, "__chunk")
            .sortWithinPartitions(*seq_cols, "__chunk", order_col)
        )
        out = ordered.mapInPandas(run, out_schema)
        return out.where(F.col("__own")).drop("__own")
    seq_hash = F.xxhash64(*seq_cols).alias("__seq")
    ordered = (
        tokens.select(*passthrough, *extra, seq_hash, hashed)
        .repartition(n_part, *seq_cols)
        .sortWithinPartitions(*seq_cols, order_col)
    )
    return ordered.mapInPandas(run, out_schema)
