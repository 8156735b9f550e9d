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
) -> LBFGSResult:
    x = np.asarray(x0, dtype=np.float64).copy()
    f, g = fun_grad(x)
    s_hist: deque[np.ndarray] = deque(maxlen=num_memories)
    y_hist: deque[np.ndarray] = deque(maxlen=num_memories)
    rho_hist: deque[float] = deque(maxlen=num_memories)
    past_f: deque[float] = deque(maxlen=period)
    history: list[dict] = []
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        gnorm = float(np.linalg.norm(g))
        xnorm = float(np.linalg.norm(x))
        if gnorm / max(1.0, xnorm) < epsilon:
            converged = True
            break
        # --- two-loop recursion: d = -H g ---
        q = g.copy()
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
        dg = float(d @ g)
        if dg >= 0:  # not a descent direction — reset to steepest descent
            d = -g
            dg = -float(g @ g)
            s_hist.clear(); y_hist.clear(); rho_hist.clear()
        # --- Armijo backtracking ---
        step = 1.0 if s_hist else min(1.0, 1.0 / max(1e-12, float(np.linalg.norm(g))))
        f_new, g_new = f, g
        ok = False
        for _ in range(max_linesearch):
            x_new = x + step * d
            f_new, g_new = fun_grad(x_new)
            if f_new <= f + 1e-4 * step * dg:
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
