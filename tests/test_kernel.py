"""CRF kernel vs brute-force path enumeration.

Port of the reference's analytic self-check strategy
(/root/reference/src/crf/src/crf1d_context.c:557-720): enumerate all
L^T paths on small random lattices and assert the lattice operators
reproduce partition factor, path probabilities, state marginals,
transition marginals, and the Viterbi argmax (tolerance 1e-9, matching
check_values at crf1d_context.c:548-555).
"""

import itertools

import numpy as np
import pytest

from crfsuite_spark.kernel import crf


def brute_force(state, trans):
    """Enumerate all paths: returns (log_norm, best_path, best_score,
    p_state [T,L], p_trans [L,L] summed over t)."""
    T, L = state.shape
    scores = {}
    for path in itertools.product(range(L), repeat=T):
        s = sum(state[t, l] for t, l in enumerate(path))
        s += sum(trans[path[t], path[t + 1]] for t in range(T - 1))
        scores[path] = s
    log_norm = np.logaddexp.reduce(np.array(list(scores.values())))
    # first-max-wins tie-break: itertools.product yields lexicographic order,
    # matching the reference's strict-< scan only if we keep the FIRST max.
    best_path, best_score = None, -np.inf
    for path, s in scores.items():
        if s > best_score:
            best_path, best_score = path, s
    p_state = np.zeros((T, L))
    p_trans = np.zeros((L, L))
    for path, s in scores.items():
        p = np.exp(s - log_norm)
        for t, l in enumerate(path):
            p_state[t, l] += p
        for t in range(T - 1):
            p_trans[path[t], path[t + 1]] += p
    return log_norm, np.array(best_path), best_score, p_state, p_trans


@pytest.mark.parametrize("seed,T,L", [(0, 3, 3), (1, 5, 3), (2, 4, 4), (3, 6, 2), (4, 1, 3), (5, 2, 4)])
def test_kernel_vs_enumeration(seed, T, L):
    rng = np.random.default_rng(seed)
    state = rng.normal(0, 2, size=(T, L))
    trans = rng.normal(0, 2, size=(L, L))
    ln_ref, path_ref, score_ref, ps_ref, pt_ref = brute_force(state, trans)

    _, ln = crf.forward(state, trans)
    assert abs(ln - ln_ref) < 1e-9

    ps, pt, ln2 = crf.marginals(state, trans)
    np.testing.assert_allclose(ps, ps_ref, atol=1e-9)
    np.testing.assert_allclose(pt, pt_ref, atol=1e-9)
    # marginals are proper distributions per position
    np.testing.assert_allclose(ps.sum(axis=1), np.ones(T), atol=1e-9)

    path, best = crf.viterbi(state, trans)
    np.testing.assert_array_equal(path, path_ref)
    assert abs(best - score_ref) < 1e-9
    assert abs(crf.path_score(state, trans, path) - best) < 1e-9

    # sequence probability of every path sums to 1
    tot = sum(
        np.exp(crf.sequence_log_prob(state, trans, np.array(p)))
        for p in itertools.product(range(L), repeat=T)
    )
    assert abs(tot - 1.0) < 1e-9


def test_viterbi_tie_break_first_max_wins():
    # identical scores everywhere → reference picks label 0 at every step
    state = np.zeros((4, 3))
    trans = np.zeros((3, 3))
    path, _ = crf.viterbi(state, trans)
    np.testing.assert_array_equal(path, np.zeros(4, dtype=np.int64))


def test_viterbi_batch_matches_single():
    rng = np.random.default_rng(42)
    L = 5
    lengths = np.array([1, 3, 7, 4, 7, 2])
    B, T_max = len(lengths), int(lengths.max())
    state = rng.normal(0, 2, size=(B, T_max, L))
    trans = rng.normal(0, 2, size=(L, L))
    paths = crf.viterbi_batch(state, trans, lengths)
    for b in range(B):
        ref, _ = crf.viterbi(state[b, : lengths[b]], trans)
        np.testing.assert_array_equal(paths[b, : lengths[b]], ref)
        assert (paths[b, lengths[b]:] == 0).all()


def test_state_scores_gather():
    state_w = np.arange(12, dtype=np.float64).reshape(4, 3)  # A=4, L=3
    aids = [np.array([0, 2]), np.array([], dtype=np.int64), np.array([3])]
    out = crf.state_scores(aids, state_w)
    np.testing.assert_allclose(out[0], state_w[0] + state_w[2])
    np.testing.assert_allclose(out[1], np.zeros(3))
    np.testing.assert_allclose(out[2], state_w[3])


def test_batched_forward_backward_marginals_match_single():
    rng = np.random.default_rng(7)
    L = 4
    lengths = np.array([1, 5, 3, 8, 2, 8])
    B, T_max = len(lengths), int(lengths.max())
    state = rng.normal(0, 1.5, size=(B, T_max, L))
    trans = rng.normal(0, 1.5, size=(L, L))
    ps_b, pt_b, ln_b = crf.marginals_batch(state, trans, lengths)
    pt_expected = np.zeros((L, L))
    for b in range(B):
        s = state[b, : lengths[b]]
        ps, pt, ln = crf.marginals(s, trans)
        np.testing.assert_allclose(ps_b[b, : lengths[b]], ps, atol=1e-9)
        assert (ps_b[b, lengths[b]:] == 0).all()
        assert abs(ln_b[b] - ln) < 1e-9
        pt_expected += pt
    np.testing.assert_allclose(pt_b, pt_expected, atol=1e-9)


def test_kernel_property_random_lattices():
    """Property test (hypothesis): on arbitrary small lattices the
    batched kernel agrees with the single-sequence kernel, marginals
    are proper distributions, and Viterbi attains the max path score."""
    from hypothesis import given, settings, strategies as st
    import itertools

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        T=st.integers(1, 6),
        L=st.integers(2, 4),
    )
    def check(seed, T, L):
        rng = np.random.default_rng(seed)
        state = rng.normal(scale=2.0, size=(T, L))
        trans = rng.normal(scale=2.0, size=(L, L))
        # marginals sum to 1 per position
        p_state, _, log_norm = crf.marginals(state, trans)
        assert np.allclose(p_state.sum(axis=1), 1.0, atol=1e-9)
        # viterbi path attains the maximum enumerated score
        path, best = crf.viterbi(state, trans)
        best_enum = max(
            crf.path_score(state, trans, np.array(p))
            for p in itertools.product(range(L), repeat=T)
        )
        assert abs(best - best_enum) < 1e-9
        assert abs(crf.path_score(state, trans, path) - best_enum) < 1e-9
        # log_norm equals logsumexp over all paths
        all_scores = [
            crf.path_score(state, trans, np.array(p))
            for p in itertools.product(range(L), repeat=T)
        ]
        m = max(all_scores)
        lse = m + np.log(sum(np.exp(s - m) for s in all_scores))
        assert abs(log_norm - lse) < 1e-9

    check()
