"""Driver-side mirror of the MinHash-LSH pipeline for dictionary-scale
inputs — bit-exact against operators/minhash.py (parity-tested in
tests/test_minhash_local.py).

Why this exists: the KG linking stages (fuzzy alias matching,
surrogate canonicalization) run the LSH chain over inputs bounded by
the number of DISTINCT surfaces — dictionary scale, thousands of rows —
while the chain itself costs ~10 Spark jobs of pure scheduling overhead
(measured ~6 s of a ~10.5 s sf0.1 pipeline run). Below a probed
threshold the same algorithm runs here in numpy/pandas in milliseconds;
above it the distributed path in operators/minhash.py is untouched.
This is the same guarded small-side trade a broadcast join makes, and
it must be BIT-exact, not approximately equal: the driver correctness
harness hash-compares pipeline output against fixtures produced under
the distributed path's exact LSH banding behavior.

Bit-exactness requires reproducing Spark's hash primitives:

- ``xxhash64`` — Spark's XXH64 variant (seed 42; chained per-column
  for multi-input), reimplemented from the public XXH64 specification
  (Yann Collet, BSD-2) / Spark's documented semantics. Verified
  against ``F.xxhash64`` over random strings and longs in pytest.
- the affine signature permutations ``(a*h + b) mod (2^31 - 1)`` with
  the SAME numpy-seeded params (imported from operators/minhash).
- the md5_32 portable variant (first 8 md5 hex chars → int, mod M).

Guards: the caller probes row count with ``limit(n+1).collect()``
(never an unbounded collect), and :func:`pair_budget` caps the
within-bucket candidate blow-up — pathological inputs (every row in
one band bucket) fall back to the distributed, spillable path.
"""

from __future__ import annotations

import hashlib
import math
from typing import Sequence

import numpy as np
import pandas as pd

from crfsuite_spark.operators.minhash import MERSENNE, _hash_params

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1
SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int = SEED) -> int:
    """Spark ``XXH64.hashLong`` (one 8-byte word). Returns SIGNED i64."""
    v = value & _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
    h = ((_rotl(h, 27) * _P1) + _P4) & _M64
    u = _fmix(h)
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_bytes(data: bytes, seed: int = SEED) -> int:
    """Full XXH64 over a byte string (Spark hashes the UTF-8 bytes of a
    string column with this). Returns SIGNED i64."""
    length = len(data)
    off, end = 0, length
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while off <= end - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[off:off + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[off + 8:off + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[off + 16:off + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[off + 24:off + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while off + 8 <= end:
        k1 = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        off += 8
    if off + 4 <= end:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        off += 4
    while off < end:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    u = _fmix(h)
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_windows(win: "np.ndarray", seed: int = SEED) -> "np.ndarray":
    """Vectorized XXH64 over ``[n, k]`` uint8 byte windows (k < 32) —
    one hash per row, bit-identical to :func:`xxh64_bytes` on each
    row's bytes (parity-tested). This is the throughput core of the
    numpy signature impl: all n shingles of a document hash in a few
    numpy passes instead of n matcher/HOF evaluations."""
    n, k = win.shape
    assert k < 32, "vectorized path covers the <32-byte (no-stripe) case"
    u64 = np.uint64
    P1, P2, P3, P4, P5 = (u64(_P1), u64(_P2), u64(_P3), u64(_P4), u64(_P5))

    def rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    with np.errstate(over="ignore"):
        h = np.full(n, u64((seed + _P5 + k) & _M64), dtype=u64)
        off = 0
        while off + 8 <= k:
            lane = np.ascontiguousarray(win[:, off:off + 8]).view("<u8").ravel()
            h ^= rotl(lane * P2, 31) * P1
            h = rotl(h, 27) * P1 + P4
            off += 8
        if off + 4 <= k:
            lane = np.ascontiguousarray(win[:, off:off + 4]).view("<u4").ravel().astype(u64)
            h ^= lane * P1
            h = rotl(h, 23) * P2 + P3
            off += 4
        while off < k:
            h ^= win[:, off].astype(u64) * P5
            h = rotl(h, 11) * P1
            off += 1
        h ^= h >> u64(33)
        h *= P2
        h ^= h >> u64(29)
        h *= P3
        h ^= h >> u64(32)
    return h


def shingle_hash_array(text: str, k: int, memo: dict | None = None) -> "np.ndarray":
    """int64 array of distinct hashed char-k-gram values for one
    string, first-occurrence order — shingle_hash_set's xxhash64
    variant, vectorized for ASCII text (the common case). Non-ASCII
    strings take the scalar per-shingle path (substr semantics are by
    code point, so fixed-width byte windows only exist for ASCII)."""
    import pandas as pd

    if len(text) < k:
        v = xxh64_bytes(text.encode("utf-8")) % MERSENNE
        return np.array([v], dtype=np.int64)
    if text.isascii() and k < 32:
        arr = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        u = xxh64_windows(win)
        s = u.view(np.int64) % np.int64(MERSENNE)  # pmod == floor-mod
        return pd.unique(s)
    memo = {} if memo is None else memo
    return np.array(shingle_hash_set(text, k, "xxhash64", memo), dtype=np.int64)


def xxh64_longs(values: Sequence[int], seed: int = SEED) -> int:
    """Spark ``xxhash64(c1, ..., cn)`` over long columns: per-column
    hashLong chained through the running hash (lsh_band_buckets'
    bucket key)."""
    h = seed
    for v in values:
        h = xxh64_long(v, h & _M64)
    return h


def _shingle_hash(s: str, hash_fn: str, memo: dict) -> int:
    v = memo.get(s)
    if v is None:
        if hash_fn == "md5_32":
            v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % MERSENNE
        else:
            v = xxh64_bytes(s.encode("utf-8")) % MERSENNE
        memo[s] = v
    return v


def shingle_hash_set(
    text: str, k: int = 3, hash_fn: str = "xxhash64", memo: dict | None = None
) -> list[int]:
    """Mirror of operators.minhash.shingle_hashes for one string:
    distinct hashed char k-grams, first-occurrence order (array_distinct
    semantics). Spark substr/length count codepoints, as Python does."""
    memo = {} if memo is None else memo
    if len(text) < k:
        grams = [text]
    else:
        grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    seen, out = set(), []
    for g in grams:
        h = _shingle_hash(g, hash_fn, memo)
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out


def local_signatures(
    texts: Sequence[str],
    n_hashes: int,
    shingle_size: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> tuple[list[list[int]], np.ndarray]:
    """(shingle sets, [n, n_hashes] minhash matrix) — mirror of
    minhash_signature (same _hash_params stream, same modulus)."""
    params = _hash_params(n_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)
    memo: dict = {}
    sets = [shingle_hash_set(t, shingle_size, hash_fn, memo) for t in texts]
    mh = np.empty((len(texts), n_hashes), dtype=np.int64)
    for i, hs in enumerate(sets):
        h = np.asarray(hs, dtype=np.int64)
        mh[i] = ((h[:, None] * a_vec[None, :] + b_vec) % MERSENNE).min(axis=0)
    return sets, mh


def _band_buckets(mh: np.ndarray, n_hashes: int, bands: int) -> list[dict]:
    """Per band: {bucket_hash: [row indices]} — mirror of
    lsh_band_buckets (chained xxhash64 over the band's components)."""
    r = n_hashes // bands
    assert bands * r == n_hashes, "bands must divide n_hashes"
    out = []
    for b in range(bands):
        buckets: dict[int, list[int]] = {}
        cols = mh[:, b * r:(b + 1) * r]
        for i in range(mh.shape[0]):
            key = xxh64_longs([int(x) for x in cols[i]])
            buckets.setdefault(key, []).append(i)
        out.append(buckets)
    return out


def pair_budget(bucket_maps: list[dict]) -> int:
    """Upper bound on candidate pairs across all band buckets."""
    return sum(
        n * (n - 1) // 2
        for buckets in bucket_maps
        for n in map(len, buckets.values())
    )


def local_self_pairs(
    ids: Sequence[str],
    texts: Sequence[str],
    n_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    estimate_margin: float | None = 0.25,
    pair_cap: int = 2_000_000,
) -> pd.DataFrame | None:
    """Mirror of minhash_self_pairs: (id_a, id_b, jaccard) with
    id_a < id_b, Jaccard >= threshold, LSH-banded candidates, the same
    signature-estimate screen. Returns None when the candidate budget
    exceeds ``pair_cap`` (caller must fall back to the distributed,
    spillable path)."""
    sets, mh = local_signatures(texts, n_hashes, shingle_size, seed, hash_fn)
    bucket_maps = _band_buckets(mh, n_hashes, bands)
    if pair_budget(bucket_maps) > pair_cap:
        return None
    cand: set[tuple[int, int]] = set()
    for buckets in bucket_maps:
        for rows in buckets.values():
            if len(rows) < 2:
                continue
            for x in range(len(rows)):
                for y in range(x + 1, len(rows)):
                    i, j = rows[x], rows[y]
                    # candidate identity is the ID pair (ordered), as in
                    # the distributed WHERE id_a < id_b
                    if ids[i] == ids[j]:
                        continue
                    cand.add((i, j) if ids[i] < ids[j] else (j, i))
    if estimate_margin is not None:
        min_eq = max(
            0, math.ceil((jaccard_threshold - estimate_margin) * n_hashes - 1e-9)
        )
        if min_eq > 0:
            cand = {
                (i, j) for i, j in cand
                if int((mh[i] == mh[j]).sum()) >= min_eq
            }
    out = []
    for i, j in cand:
        sa, sb = set(sets[i]), set(sets[j])
        jac = len(sa & sb) / len(sa | sb)
        if jac >= jaccard_threshold:
            out.append((ids[i], ids[j], jac))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


def local_fuzzy_best(
    query_norms: Sequence[str],
    dict_rows: Sequence[tuple[str, str, float]],
    n_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    pair_cap: int = 2_000_000,
) -> list[tuple[str, str]] | None:
    """Mirror of kg.linking._fuzzy_best: for each distinct missed
    normalized surface, the best dictionary match (jaccard desc, weight
    desc, canonical_id asc) with Jaccard >= threshold among LSH-banded
    candidates. ``dict_rows``: (normalized_alias, canonical_id, weight)
    with NULL weights already coerced to -inf, empty aliases dropped,
    distinct. Returns [(norm, canonical_id)], or None over pair_cap."""
    queries = list(dict.fromkeys(query_norms))
    aliases = sorted({a for a, _, _ in dict_rows})
    if not queries or not aliases:
        return []
    by_alias: dict[str, list[tuple[str, float]]] = {}
    for a, cid, w in dict_rows:
        by_alias.setdefault(a, []).append((cid, w))
    qsets, qmh = local_signatures(queries, n_hashes, shingle_size, seed)
    asets, amh = local_signatures(aliases, n_hashes, shingle_size, seed)
    qb = _band_buckets(qmh, n_hashes, bands)
    ab = _band_buckets(amh, n_hashes, bands)
    budget = sum(
        len(qrows) * len(ab[b].get(bucket, ()))
        for b in range(bands)
        for bucket, qrows in qb[b].items()
    )
    if budget > pair_cap:
        return None
    cand: set[tuple[int, int]] = set()
    for b in range(bands):
        for bucket, qrows in qb[b].items():
            arows = ab[b].get(bucket)
            if not arows:
                continue
            for qi in qrows:
                for ai in arows:
                    cand.add((qi, ai))
    best: dict[int, tuple] = {}
    for qi, ai in cand:
        sa, sb = set(qsets[qi]), set(asets[ai])
        jac = len(sa & sb) / len(sa | sb)
        if jac < jaccard_threshold:
            continue
        for cid, w in by_alias[aliases[ai]]:
            # min over (-jaccard, -weight, id): == window (jaccard desc,
            # weight desc, id asc)
            key = (-jac, -w, cid)
            cur = best.get(qi)
            if cur is None or key < cur[0]:
                best[qi] = (key, cid)
    return [(queries[qi], cid) for qi, (_, cid) in best.items()]
