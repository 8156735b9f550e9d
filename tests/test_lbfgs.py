"""L-BFGS optimizer sanity on known convex problems."""

import numpy as np

from crfsuite_spark.kernel.lbfgs import minimize_lbfgs


def test_quadratic():
    A = np.diag([1.0, 10.0, 100.0])
    b = np.array([1.0, -2.0, 3.0])

    def fg(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    res = minimize_lbfgs(fg, np.zeros(3), max_iterations=200, epsilon=1e-10)
    np.testing.assert_allclose(res.x, np.linalg.solve(A, b), atol=1e-6)
    assert res.converged


def test_logistic_regression():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 5))
    w_true = np.array([1.0, -2.0, 0.5, 0.0, 3.0])
    y = (X @ w_true + 0.1 * rng.normal(size=200) > 0).astype(float)

    def fg(w):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        f = -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)) + 0.01 * w @ w
        g = X.T @ (p - y) / len(y) + 0.02 * w
        return f, g

    res = minimize_lbfgs(fg, np.zeros(5), max_iterations=300, epsilon=1e-8)
    f0, _ = fg(np.zeros(5))
    assert res.fun < f0 * 0.5
    # gradient nearly zero at solution
    _, g = fg(res.x)
    assert np.linalg.norm(g) < 1e-4
    # signs recovered for the strong coefficients
    assert res.x[0] > 0 and res.x[1] < 0 and res.x[4] > 0


def test_rosenbrock_reaches_optimum():
    def fg(x):
        a, b = 1.0, 100.0
        f = (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2
        g = np.array([
            -2 * (a - x[0]) - 4 * b * x[0] * (x[1] - x[0] ** 2),
            2 * b * (x[1] - x[0] ** 2),
        ])
        return f, g

    res = minimize_lbfgs(fg, np.array([-1.2, 1.0]), max_iterations=500, epsilon=1e-10)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)


def test_owlqn_l1_produces_exact_zeros():
    """OWL-QN on 0.5||x - b||^2 + c1||x||_1 has the closed-form
    soft-threshold solution x* = sign(b) * max(|b| - c1, 0)."""
    import numpy as np
    from crfsuite_spark.kernel.lbfgs import minimize_lbfgs

    b = np.array([3.0, -2.0, 0.5, -0.3, 0.0, 1.5])
    c1 = 1.0

    def fg(x):
        return 0.5 * float((x - b) @ (x - b)), x - b

    res = minimize_lbfgs(fg, np.zeros_like(b), max_iterations=200, l1_c=c1)
    expected = np.sign(b) * np.maximum(np.abs(b) - c1, 0.0)
    assert np.allclose(res.x, expected, atol=1e-4), (res.x, expected)
    # exact zeros, not tiny values
    assert (res.x[2] == 0.0) and (res.x[3] == 0.0) and (res.x[4] == 0.0)


def test_morethuente_vs_backtracking_same_optimum():
    """Both line searches reach the same optimum on a convex problem;
    MoreThuente (strong Wolfe) must not need more function evals."""
    A = np.diag([1.0, 10.0, 100.0])
    b = np.array([1.0, -2.0, 3.0])
    evals = {"mt": 0, "bt": 0}

    def make_fg(key):
        def fg(x):
            evals[key] += 1
            return 0.5 * x @ A @ x - b @ x, A @ x - b
        return fg

    r_mt = minimize_lbfgs(make_fg("mt"), np.zeros(3), max_iterations=200,
                          epsilon=1e-10, linesearch="morethuente")
    r_bt = minimize_lbfgs(make_fg("bt"), np.zeros(3), max_iterations=200,
                          epsilon=1e-10, linesearch="backtracking")
    x_star = np.linalg.solve(A, b)
    np.testing.assert_allclose(r_mt.x, x_star, atol=1e-6)
    np.testing.assert_allclose(r_bt.x, x_star, atol=1e-6)
    assert r_mt.converged and r_bt.converged
    assert evals["mt"] <= evals["bt"] * 1.5  # MT is at least as frugal


def test_morethuente_rosenbrock():
    """Non-quadratic curvature: strong-Wolfe search still converges on
    the 2-d Rosenbrock valley (a standard line-search stress test)."""
    def fg(x):
        a, bq = 1.0, 100.0
        f = (a - x[0]) ** 2 + bq * (x[1] - x[0] ** 2) ** 2
        g = np.array([
            -2 * (a - x[0]) - 4 * bq * x[0] * (x[1] - x[0] ** 2),
            2 * bq * (x[1] - x[0] ** 2),
        ])
        return f, g

    res = minimize_lbfgs(fg, np.array([-1.2, 1.0]), max_iterations=500,
                         epsilon=1e-10, linesearch="morethuente")
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)


def test_morethuente_exhausted_linesearch_no_crash():
    """Tiny max_linesearch budgets must degrade gracefully (return the
    best evaluated step or fail the search), never crash on an
    unevaluated step or divide by a degenerate interval."""
    rng = np.random.default_rng(3)
    for trial in range(5):
        d = rng.integers(2, 6)
        A = np.diag(10.0 ** rng.uniform(-2, 4, size=d))
        b = rng.normal(size=d)

        def fg(x):
            return 0.5 * x @ A @ x - b @ x, A @ x - b

        for mls in (1, 2, 3):
            res = minimize_lbfgs(fg, np.zeros(d), max_iterations=50,
                                 max_linesearch=mls, linesearch="morethuente")
            f0, _ = fg(np.zeros(d))
            assert res.fun <= f0 + 1e-12


def test_morethuente_degenerate_bracket_rejects_zero_step():
    """A bracket that collapses onto stx == 0 must not report ok with a
    zero step (the caller would loop forever, one gradient job per
    iteration, until the period stop fires)."""
    from crfsuite_spark.kernel.lbfgs import _more_thuente

    # phi claims descent at 0 (dg0 = -1) but increases immediately and
    # steeply, so every trial fails sufficient decrease and the bracket
    # degenerates toward stx == 0
    def phi(s):
        return 1.0 + 1000.0 * s, 1000.0

    stp, f, n, ok = _more_thuente(phi, 1.0, -1.0, 1.0)
    assert not (ok and stp == 0.0)
