"""Linear-chain CRF math kernel — pure numpy, log-space.

Re-expresses the lattice operators of the reference C engine
(/root/reference/src/crf/src/crf1d_context.c) as vectorized numpy.
The reference works in the exp domain with per-step scaling
(crf1d_context.c:190-318); we work in the log domain with logsumexp —
equivalent up to ~1e-12 in the final probabilities, and Viterbi is
log-domain in the reference too (crf1d_context.c:475-546), so decode
parity is exact, including the first-argmax tie-break (strict ``<``
comparison == ``np.argmax`` first-max-wins).

All functions take per-sequence score matrices:

- ``state``: float64 [T, L] — sum of active state-feature weights per
  (position, label), built by :func:`state_scores` (crf1d_tag.c:62-100).
- ``trans``: float64 [L, L] — transition weights from label i to label j
  (crf1d_tag.c:102-123; computed once per model and reused).

Nothing here touches Spark; the decode/train layers call these inside
Arrow pandas UDFs on batches of sequences.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def logsumexp(a: np.ndarray, axis: int = -1) -> np.ndarray:
    """Stable log(sum(exp(a))) along ``axis``; handles all -inf rows."""
    m = np.max(a, axis=axis, keepdims=True)
    m_safe = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m_safe), axis=axis)) + np.squeeze(m_safe, axis=axis)
    return np.where(np.isfinite(np.squeeze(m, axis=axis)), out, NEG_INF)


def state_scores(aids: list[np.ndarray], state_w: np.ndarray) -> np.ndarray:
    """Build the [T, L] state-score matrix from active attribute ids.

    ``aids[t]`` is an int array of attribute ids active at position t
    (unknown attributes already dropped, mirroring crfsuite.hpp:403-410).
    ``state_w`` is the dense [A, L] state-weight matrix.
    Mirrors crf1d_tag.c:62-100 (sum of weights of active features).
    """
    L = state_w.shape[1]
    T = len(aids)
    out = np.zeros((T, L), dtype=np.float64)
    for t, ids in enumerate(aids):
        if len(ids):
            out[t] = state_w[ids].sum(axis=0)
    return out


def forward(state: np.ndarray, trans: np.ndarray) -> tuple[np.ndarray, float]:
    """Log-space forward pass. Returns (log_alpha [T, L], log_norm).

    Equivalent to the scaled exp-domain pass at crf1d_context.c:190-235
    (log_norm there is -sum(log scale)).
    """
    T, L = state.shape
    alpha = np.empty((T, L), dtype=np.float64)
    alpha[0] = state[0]
    for t in range(1, T):
        # alpha[t, j] = state[t, j] + logsumexp_i(alpha[t-1, i] + trans[i, j])
        alpha[t] = state[t] + logsumexp(alpha[t - 1][:, None] + trans, axis=0)
    return alpha, float(logsumexp(alpha[T - 1], axis=0))


def backward(state: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Log-space backward pass → log_beta [T, L] (crf1d_context.c:237-269)."""
    T, L = state.shape
    beta = np.empty((T, L), dtype=np.float64)
    beta[T - 1] = 0.0
    for t in range(T - 2, -1, -1):
        # beta[t, i] = logsumexp_j(trans[i, j] + state[t+1, j] + beta[t+1, j])
        beta[t] = logsumexp(trans + (state[t + 1] + beta[t + 1])[None, :], axis=1)
    return beta


def marginals(
    state: np.ndarray, trans: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """State marginals p(y_t = l), summed transition marginals, log_norm.

    Returns (p_state [T, L], p_trans [L, L], log_norm); p_trans is
    sum_t p(y_t = i, y_{t+1} = j) — the quantity the model-expectation
    aggregate needs (crf1d_context.c:271-318, crf1d_encode.c:375-424).
    """
    T, L = state.shape
    alpha, log_norm = forward(state, trans)
    beta = backward(state, trans)
    p_state = np.exp(alpha + beta - log_norm)
    p_trans = np.zeros((L, L), dtype=np.float64)
    for t in range(T - 1):
        # log p(i→j at t) = alpha[t,i] + trans[i,j] + state[t+1,j] + beta[t+1,j] - Z
        lp = alpha[t][:, None] + trans + (state[t + 1] + beta[t + 1])[None, :] - log_norm
        p_trans += np.exp(lp)
    return p_state, p_trans, log_norm


def path_score(state: np.ndarray, trans: np.ndarray, path: np.ndarray) -> float:
    """Unnormalized log-score of a label path (crf1d_context.c:438-468)."""
    T = state.shape[0]
    s = float(state[np.arange(T), path].sum())
    if T > 1:
        s += float(trans[path[:-1], path[1:]].sum())
    return s


def sequence_log_prob(state: np.ndarray, trans: np.ndarray, path: np.ndarray) -> float:
    """log p(path) = score(path) - log_norm (crfsuite.hpp:472-538)."""
    _, log_norm = forward(state, trans)
    return path_score(state, trans, path) - log_norm


def viterbi(state: np.ndarray, trans: np.ndarray) -> tuple[np.ndarray, float]:
    """Max-product decode with first-argmax tie-break.

    Mirrors crf1dc_viterbi (crf1d_context.c:475-546): log-domain DP with
    backpointers; ties broken by strict ``<`` (first max wins), which is
    exactly ``np.argmax`` semantics. Returns (path [T], max log-score).
    """
    T, L = state.shape
    delta = state[0].copy()
    back = np.zeros((T, L), dtype=np.int64)
    for t in range(1, T):
        cand = delta[:, None] + trans  # [L_prev, L_cur]
        back[t] = np.argmax(cand, axis=0)
        delta = state[t] + cand[back[t], np.arange(L)]
    path = np.empty(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(delta))
    best = float(delta[path[T - 1]])
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path, best


def forward_batch(
    state: np.ndarray, trans: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Batched log-space forward over padded [B, T_max, L] tensors.

    Returns (log_alpha [B, T_max, L], log_norm [B]). Positions beyond
    ``lengths[b]`` hold frozen (garbage) values — mask downstream.
    """
    B, T_max, L = state.shape
    alpha = np.empty((B, T_max, L), dtype=np.float64)
    alpha[:, 0, :] = state[:, 0, :]
    cur = alpha[:, 0, :].copy()
    for t in range(1, T_max):
        active = lengths > t
        if not active.any():
            alpha[:, t, :] = cur
            continue
        new = state[:, t, :] + logsumexp(cur[:, :, None] + trans[None, :, :], axis=1)
        cur = np.where(active[:, None], new, cur)
        alpha[:, t, :] = cur
    last = alpha[np.arange(B), lengths - 1, :]
    return alpha, logsumexp(last, axis=1)


def backward_batch(
    state: np.ndarray, trans: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Batched log-space backward → log_beta [B, T_max, L].

    beta[b, lengths[b]-1] = 0; positions at/after lengths[b] are junk.
    """
    B, T_max, L = state.shape
    beta = np.zeros((B, T_max, L), dtype=np.float64)
    bi = np.arange(B)
    beta[bi, lengths - 1, :] = 0.0
    cur = np.zeros((B, L), dtype=np.float64)
    for t in range(T_max - 2, -1, -1):
        # valid update for sequences with lengths >= t+2
        active = lengths >= t + 2
        nxt = state[:, t + 1, :] + beta[:, t + 1, :]
        new = logsumexp(trans[None, :, :] + nxt[:, None, :], axis=2)
        cur = np.where(active[:, None], new, 0.0)
        beta[:, t, :] = cur
    return beta


def marginals_batch(
    state: np.ndarray, trans: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched marginals: (p_state [B,T,L] zero-padded, p_trans_total
    [L,L] summed over the whole batch, log_norm [B])."""
    B, T_max, L = state.shape
    alpha, log_norm = forward_batch(state, trans, lengths)
    beta = backward_batch(state, trans, lengths)
    p_state = np.exp(alpha + beta - log_norm[:, None, None])
    mask = np.arange(T_max)[None, :] < lengths[:, None]
    p_state *= mask[:, :, None]
    p_trans = np.zeros((L, L), dtype=np.float64)
    for t in range(T_max - 1):
        active = lengths >= t + 2
        if not active.any():
            continue
        lp = (
            alpha[:, t, :, None]
            + trans[None, :, :]
            + (state[:, t + 1, :] + beta[:, t + 1, :])[:, None, :]
            - log_norm[:, None, None]
        )
        p_trans += np.exp(lp[active]).sum(axis=0)
    return p_state, p_trans, log_norm


def viterbi_batch(
    state: np.ndarray, trans: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Batched Viterbi over padded [B, T_max, L] state tensors.

    The decode hot path: one vectorized DP over the whole Arrow batch
    instead of a Python loop per sequence. Positions t >= lengths[b] are
    padding and ignored. Returns int paths [B, T_max] (padding = 0).

    Padding correctness: at each step t we only *commit* the updated
    (delta, backpointer) for sequences with lengths > t, so a finished
    sequence's delta stays frozen at its last real position and the
    final argmax reads the right timestep.
    """
    B, T_max, L = state.shape
    delta = state[:, 0, :].copy()  # [B, L]
    back = np.zeros((B, T_max, L), dtype=np.int32)
    ar = np.arange(L)
    for t in range(1, T_max):
        active = lengths > t  # [B]
        if not active.any():
            break
        cand = delta[:, :, None] + trans[None, :, :]  # [B, L_prev, L_cur]
        bp = np.argmax(cand, axis=1)  # [B, L]
        new_delta = state[:, t, :] + np.take_along_axis(cand, bp[:, None, :], axis=1)[:, 0, :]
        delta = np.where(active[:, None], new_delta, delta)
        back[active, t, :] = bp[active]
    paths = np.zeros((B, T_max), dtype=np.int64)
    last = np.argmax(delta, axis=1)  # [B]
    bi = np.arange(B)
    # walk back per timestep, vectorized across the batch
    cur = last
    for t in range(T_max - 1, -1, -1):
        is_last = lengths - 1 == t
        cur = np.where(is_last, last, cur)
        within = lengths > t
        paths[within, t] = cur[within]
        prev = back[bi, t, cur]
        cur = np.where(within & (t > 0), prev, cur)
    return paths
