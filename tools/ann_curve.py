"""Recall/cost sweep for the ANN batch-join operators.

Measures recall@k vs brute-force cosine and the mean candidate
fraction (the join's cost driver) on the sf0.01 embeddings table, for

- single-table hyperplane LSH with multiprobe (operators.similarity.
  ann_join's bucket scheme), and
- multi-table LSH (ann_join_multitable): L independent plane sets,
  candidates = union over tables.

Pure-numpy mirror of the operators' bucket math (same seeds, same
plane generation) so the sweep runs in seconds; the Spark operators
are separately recall-gated in tests/test_dedup.py.

Usage: python tools/ann_curve.py [sf_dir]
"""

import sys
from itertools import combinations

import numpy as np
import pandas as pd

K = 3
N_QUERIES = 50


def load(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    return X[order]


def brute_topk(X, qi, k):
    q = X[qi]
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    return set(np.argsort(-cos)[:k])


def single_table(X, n_planes, multiprobe, seed=42):
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, X.shape[1]))
    bits = (X @ planes.T > 0).astype(np.int64)
    bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1)

    def probes(qb):
        ps = {qb}
        if multiprobe >= 1:
            ps |= {qb ^ (1 << j) for j in range(n_planes)}
        if multiprobe >= 2:
            ps |= {qb ^ (1 << i) ^ (1 << j)
                   for i, j in combinations(range(n_planes), 2)}
        return ps

    return bucket, probes


def multi_table(X, n_tables, n_planes, multiprobe, seed=42):
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, X.shape[1]))
    buckets = []
    for t in range(n_tables):
        bits = (X @ planes[t].T > 0).astype(np.int64)
        buckets.append((bits * (1 << np.arange(n_planes))).sum(axis=1))

    def cands(qi):
        out = set()
        for t in range(n_tables):
            qb = buckets[t][qi]
            ps = {qb}
            if multiprobe >= 1:
                ps |= {qb ^ (1 << j) for j in range(n_planes)}
            out |= set(np.nonzero(np.isin(buckets[t], list(ps)))[0])
        return out

    return cands


def eval_single(X, n_planes, multiprobe):
    bucket, probes = single_table(X, n_planes, multiprobe)
    qs = np.linspace(0, len(X) - 1, N_QUERIES).astype(int)
    rec, frac = [], []
    for qi in qs:
        cand = set(np.nonzero(np.isin(bucket, list(probes(bucket[qi]))))[0])
        gold = brute_topk(X, qi, K)
        rec.append(len(gold & cand) / K)
        frac.append(len(cand) / len(X))
    return np.mean(rec), np.mean(frac)


def eval_multi(X, n_tables, n_planes, multiprobe):
    cands = multi_table(X, n_tables, n_planes, multiprobe)
    qs = np.linspace(0, len(X) - 1, N_QUERIES).astype(int)
    rec, frac = [], []
    for qi in qs:
        cand = cands(qi)
        gold = brute_topk(X, qi, K)
        rec.append(len(gold & cand) / K)
        frac.append(len(cand) / len(X))
    return np.mean(rec), np.mean(frac)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    X = load(sf)
    print(f"{len(X)} vectors dim {X.shape[1]}; recall@{K}, {N_QUERIES} queries")
    print("single-table: planes probe recall cand")
    for p, mp in [(4, 1), (4, 2), (4, 3), (6, 2), (6, 3), (8, 2), (8, 3), (10, 3)]:
        r, c = eval_single(X, p, mp)
        print(f"  {p:2d} {mp} {r:.2f} {c:.2f}")
    print("multi-table: tables planes probe recall cand")
    for t, p, mp in [(2, 6, 0), (4, 6, 0), (6, 6, 0), (8, 6, 0),
                     (4, 8, 0), (6, 8, 0), (8, 8, 0), (10, 8, 0),
                     (2, 6, 1), (4, 6, 1), (2, 8, 1), (4, 8, 1), (6, 8, 1)]:
        r, c = eval_multi(X, t, p, mp)
        print(f"  {t:2d} {p:2d} {mp} {r:.2f} {c:.2f}")


if __name__ == "__main__":
    main()
