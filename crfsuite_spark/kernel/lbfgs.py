"""Pure-numpy L-BFGS (two-loop recursion) with backtracking line search.

Stands in for the reference's bundled libLBFGS
(/root/reference/src/liblbfgs/lib/lbfgs.c, wired at
src/crf/src/train_lbfgs.c:217-341). scipy is not available in the
target environment, so this is a minimal, deterministic implementation
of the public L-BFGS algorithm (Nocedal & Wright, Numerical
Optimization, Alg. 7.4/7.5) sufficient for the convex CRF objective:

- two-loop recursion with ``m`` correction pairs (reference default
  num_memories=6, train_lbfgs.c:163),
- Armijo backtracking line search (the reference defaults to
  More-Thuente; for a convex objective backtracking converges to the
  same optimum),
- convergence on gradient norm ``||g|| / max(1, ||x||) < epsilon``
  (reference epsilon=1e-5, train_lbfgs.c:168) and on relative
  improvement over a ``period`` window (delta=1e-5, period=10,
  train_lbfgs.c:169-170).

The objective callable returns ``(f, g)``; L2 regularization is the
caller's job (the CRF trainer adds ``c2 * ||w||^2`` like
train_lbfgs.c:98-106).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Callable
from dataclasses import dataclass, field


import numpy as np


@dataclass
class LBFGSResult:
    x: np.ndarray
    fun: float
    n_iter: int
    converged: bool
    history: list[dict] = field(default_factory=list)


def _pseudo_gradient(x: np.ndarray, g: np.ndarray, c1: float) -> np.ndarray:
    """OWL-QN pseudo-gradient of f(x) + c1*||x||_1 (Andrew & Gao 2007;
    the algorithm libLBFGS runs when orthantwise_c > 0, which the
    reference sets to c1 at train_lbfgs.c:289-291)."""
    pg = g + c1 * np.sign(x)
    at_zero = x == 0.0
    lo = g[at_zero] + c1
    hi = g[at_zero] - c1
    z = np.zeros(at_zero.sum())
    z = np.where(lo < 0, lo, z)
    z = np.where(hi > 0, hi, z)
    pg[at_zero] = z
    return pg


def minimize_lbfgs(
    fun_grad: Callable[[np.ndarray], tuple[float, np.ndarray]],
    x0: np.ndarray,
    max_iterations: int = 100,
    num_memories: int = 6,
    epsilon: float = 1e-5,
    period: int = 10,
    delta: float = 1e-5,
    max_linesearch: int = 20,
    callback: Callable[[int, np.ndarray, float, float], None] | None = None,
    l1_c: float = 0.0,
) -> LBFGSResult:
    """``l1_c`` > 0 switches to OWL-QN: pseudo-gradient direction,
    orthant-constrained search with per-step projection, and the L1 term
    added to the objective (the smooth ``fun_grad`` stays L1-free)."""
    x = np.asarray(x0, dtype=np.float64).copy()
    f, g = fun_grad(x)
    if l1_c > 0:
        f += l1_c * float(np.abs(x).sum())
    s_hist: deque[np.ndarray] = deque(maxlen=num_memories)
    y_hist: deque[np.ndarray] = deque(maxlen=num_memories)
    rho_hist: deque[float] = deque(maxlen=num_memories)
    past_f: deque[float] = deque(maxlen=period)
    history: list[dict] = []
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        g_eff = _pseudo_gradient(x, g, l1_c) if l1_c > 0 else g
        gnorm = float(np.linalg.norm(g_eff))
        xnorm = float(np.linalg.norm(x))
        if gnorm / max(1.0, xnorm) < epsilon:
            converged = True
            break
        # --- two-loop recursion: d = -H g ---
        q = g_eff.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a = rho * float(s @ q)
            alphas.append(a)
            q -= a * y
        if y_hist:
            ys = float(s_hist[-1] @ y_hist[-1])
            yy = float(y_hist[-1] @ y_hist[-1])
            q *= ys / yy
        for (s, y, rho), a in zip(zip(s_hist, y_hist, rho_hist), reversed(alphas)):
            b = rho * float(y @ q)
            q += (a - b) * s
        d = -q
        if l1_c > 0:
            # constrain the direction to the pseudo-gradient's orthant
            d[d * -g_eff <= 0] = 0.0
        dg = float(d @ g_eff)
        if dg >= 0:  # not a descent direction — reset to steepest descent
            d = -g_eff
            dg = -float(g_eff @ g_eff)
            s_hist.clear(); y_hist.clear(); rho_hist.clear()
        # orthant for the projected line search: sign(x), or where x==0
        # the direction the pseudo-gradient pushes
        if l1_c > 0:
            orthant = np.where(x != 0.0, np.sign(x), np.sign(-g_eff))
        # --- Armijo backtracking ---
        step = 1.0 if s_hist else min(1.0, 1.0 / max(1e-12, float(np.linalg.norm(g_eff))))
        f_new, g_new = f, g
        ok = False
        for _ in range(max_linesearch):
            x_new = x + step * d
            if l1_c > 0:
                # project onto the orthant: zero out sign flips
                x_new = np.where(x_new * orthant < 0, 0.0, x_new)
            f_new, g_new = fun_grad(x_new)
            if l1_c > 0:
                f_new += l1_c * float(np.abs(x_new).sum())
                # Armijo on the projected step (Andrew & Gao eq. 4)
                if f_new <= f + 1e-4 * float(g_eff @ (x_new - x)):
                    ok = True
                    break
            elif f_new <= f + 1e-4 * step * dg:
                ok = True
                break
            step *= 0.5
        if not ok:
            break  # line search failed — keep best x
        s = x_new - x
        yv = g_new - g
        sy = float(s @ yv)
        if sy > 1e-10:
            s_hist.append(s)
            y_hist.append(yv)
            rho_hist.append(1.0 / sy)
        x, f, g = x_new, f_new, g_new
        history.append({"iter": it, "loss": f, "gnorm": float(np.linalg.norm(g)), "step": step})
        if callback is not None:
            callback(it, x, f, float(np.linalg.norm(g)))
        # --- improvement-over-period stop (train_lbfgs.c period/delta) ---
        if len(past_f) == period:
            rate = (past_f[0] - f) / max(abs(f), 1e-12)
            if rate < delta:
                converged = True
                past_f.append(f)
                break
        past_f.append(f)
    return LBFGSResult(x=x, fun=f, n_iter=it, converged=converged, history=history)
