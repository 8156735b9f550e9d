"""Pure-numpy L-BFGS (two-loop recursion) with backtracking line search.

Stands in for the reference's bundled libLBFGS
(/root/reference/src/liblbfgs/lib/lbfgs.c, wired at
src/crf/src/train_lbfgs.c:217-341). scipy is not available in the
target environment, so this is a minimal, deterministic implementation
of the public L-BFGS algorithm (Nocedal & Wright, Numerical
Optimization, Alg. 7.4/7.5) sufficient for the convex CRF objective:

- two-loop recursion with ``m`` correction pairs (reference default
  num_memories=6, train_lbfgs.c:163),
- Moré-Thuente strong-Wolfe line search (the reference default,
  train_lbfgs.c linesearch=MoreThuente; implemented from the published
  Moré & Thuente 1994 / MINPACK cvsrch+cstep algorithm) with Armijo
  backtracking as the alternative — and as the FORCED search under
  OWL-QN, matching train_lbfgs.c:288-294,
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


def _cstep(stx, fx, dgx, sty, fy, dgy, stp, fp, dgp, brackt, stmin, stmax):
    """One trial-value update of the Moré-Thuente line search (the
    published MINPACK ``cstep``: safeguarded cubic/quadratic
    interpolation over a bracketing interval — Moré & Thuente 1994,
    §4; the same algorithm the reference's liblbfgs runs for its
    default ``linesearch=MoreThuente``). Pure scalar math.

    Returns (stx, fx, dgx, sty, fy, dgy, stp, brackt)."""
    sgnd = dgp * np.sign(dgx)
    if fp > fx:
        # case 1: higher function value — minimum bracketed
        bound = True
        theta = 3 * (fx - fp) / (stp - stx) + dgx + dgp
        s = max(abs(theta), abs(dgx), abs(dgp))
        gamma = s * np.sqrt((theta / s) ** 2 - (dgx / s) * (dgp / s))
        if stp < stx:
            gamma = -gamma
        p = (gamma - dgx) + theta
        q = ((gamma - dgx) + gamma) + dgp
        r = p / q
        stpc = stx + r * (stp - stx)
        stpq = stx + ((dgx / ((fx - fp) / (stp - stx) + dgx)) / 2) * (stp - stx)
        if abs(stpc - stx) < abs(stpq - stx):
            stpf = stpc
        else:
            stpf = stpc + (stpq - stpc) / 2
        brackt = True
    elif sgnd < 0:
        # case 2: opposite-sign derivatives — minimum bracketed
        bound = False
        theta = 3 * (fx - fp) / (stp - stx) + dgx + dgp
        s = max(abs(theta), abs(dgx), abs(dgp))
        gamma = s * np.sqrt((theta / s) ** 2 - (dgx / s) * (dgp / s))
        if stp > stx:
            gamma = -gamma
        p = (gamma - dgp) + theta
        q = ((gamma - dgp) + gamma) + dgx
        r = p / q
        stpc = stp + r * (stx - stp)
        stpq = stp + (dgp / (dgp - dgx)) * (stx - stp)
        stpf = stpc if abs(stpc - stp) > abs(stpq - stp) else stpq
        brackt = True
    elif abs(dgp) < abs(dgx):
        # case 3: derivative decreased in magnitude, same sign
        bound = True
        theta = 3 * (fx - fp) / (stp - stx) + dgx + dgp
        s = max(abs(theta), abs(dgx), abs(dgp))
        gamma = s * np.sqrt(max(0.0, (theta / s) ** 2 - (dgx / s) * (dgp / s)))
        if stp > stx:
            gamma = -gamma
        p = (gamma - dgp) + theta
        q = (gamma + (dgx - dgp)) + gamma
        r = p / q
        if r < 0 and gamma != 0:
            stpc = stp + r * (stx - stp)
        elif stp > stx:
            stpc = stmax
        else:
            stpc = stmin
        stpq = stp + (dgp / (dgp - dgx)) * (stx - stp)
        if brackt:
            stpf = stpc if abs(stp - stpc) < abs(stp - stpq) else stpq
        else:
            stpf = stpc if abs(stp - stpc) > abs(stp - stpq) else stpq
    else:
        # case 4: derivative did not decrease
        bound = False
        if brackt:
            theta = 3 * (fp - fy) / (sty - stp) + dgy + dgp
            s = max(abs(theta), abs(dgy), abs(dgp))
            gamma = s * np.sqrt((theta / s) ** 2 - (dgy / s) * (dgp / s))
            if stp > sty:
                gamma = -gamma
            p = (gamma - dgp) + theta
            q = ((gamma - dgp) + gamma) + dgy
            r = p / q
            stpf = stp + r * (sty - stp)
        elif stp > stx:
            stpf = stmax
        else:
            stpf = stmin
    # update the interval
    if fp > fx:
        sty, fy, dgy = stp, fp, dgp
    else:
        if sgnd < 0:
            sty, fy, dgy = stx, fx, dgx
        stx, fx, dgx = stp, fp, dgp
    stp = min(stmax, max(stmin, stpf))
    if brackt and bound:
        # safeguard: keep the trial away from the far bracket end
        lim = stx + 0.66 * (sty - stx)
        stp = min(lim, stp) if sty > stx else max(lim, stp)
    return stx, fx, dgx, sty, fy, dgy, stp, brackt


def _more_thuente(phi, f0, dg0, step0, ftol=1e-4, gtol=0.9, xtol=1e-16,
                  max_linesearch=20, step_min=1e-20, step_max=1e20):
    """Moré-Thuente line search: find ``stp`` satisfying the strong
    Wolfe conditions along a direction. ``phi(stp) -> (f, dg)`` where
    dg is the directional derivative at stp. Returns
    (stp, f, n_evals, ok)."""
    if dg0 >= 0:
        return 0.0, f0, 0, False
    brackt = False
    stage1 = True
    finit, dgtest = f0, ftol * dg0
    width = step_max - step_min
    width1 = 2 * width
    stx, fx, dgx = 0.0, finit, dg0
    sty, fy, dgy = 0.0, finit, dg0
    stp = step0
    f, dg = f0, dg0
    for n in range(1, max_linesearch + 1):
        if brackt:
            stmin, stmax = min(stx, sty), max(stx, sty)
        else:
            stmin, stmax = stx, stp + 4.0 * (stp - stx)
        stp = min(max(stp, step_min), step_max)
        # unusual termination (MINPACK info=4/5/6 analogues): interval
        # degenerate or below xtol — evaluate the best step so far and
        # RETURN instead of re-entering cstep with stp == stx (which
        # would divide by stp - stx == 0)
        bail = brackt and (
            stp <= stmin or stp >= stmax or stmax - stmin <= xtol * stmax
        )
        if bail:
            stp = stx
        f, dg = phi(stp)
        ftest1 = finit + stp * dgtest
        # strong Wolfe: sufficient decrease + curvature
        if f <= ftest1 and abs(dg) <= gtol * (-dg0):
            return stp, f, n, True
        if bail:
            # stp can have collapsed to stx == 0.0 (f0 <= finit holds
            # trivially); accepting a zero step would make the caller
            # loop forever burning one gradient job per iteration
            return stp, f, n, (f <= ftest1) and stp > 0
        if stage1 and f <= ftest1 and dg >= min(ftol, gtol) * dg0:
            stage1 = False
        if stage1 and f <= fx and f > ftest1:
            # use modified function values (Moré-Thuente §3 psi trick)
            fm = f - stp * dgtest
            fxm = fx - stx * dgtest
            fym = fy - sty * dgtest
            dgm = dg - dgtest
            dgxm = dgx - dgtest
            dgym = dgy - dgtest
            stx, fxm, dgxm, sty, fym, dgym, stp, brackt = _cstep(
                stx, fxm, dgxm, sty, fym, dgym, stp, fm, dgm, brackt, stmin, stmax
            )
            fx = fxm + stx * dgtest
            fy = fym + sty * dgtest
            dgx = dgxm + dgtest
            dgy = dgym + dgtest
        else:
            stx, fx, dgx, sty, fy, dgy, stp, brackt = _cstep(
                stx, fx, dgx, sty, fy, dgy, stp, f, dg, brackt, stmin, stmax
            )
        if brackt:
            if abs(sty - stx) >= 0.66 * width1:
                stp = stx + 0.5 * (sty - stx)
            width1 = width
            width = abs(sty - stx)
    # exhausted: cstep already moved stp past the last evaluation, so
    # return the best EVALUATED step (stx tracks it by construction) —
    # returning an unevaluated stp would break callers that cache
    # (x, f, g) per evaluated step
    ok = fx <= finit + stx * dgtest and stx > 0
    return (stx, fx, max_linesearch, ok)


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
    linesearch: str = "morethuente",
) -> LBFGSResult:
    """``l1_c`` > 0 switches to OWL-QN: pseudo-gradient direction,
    orthant-constrained search with per-step projection, and the L1 term
    added to the objective (the smooth ``fun_grad`` stays L1-free).

    ``linesearch``: 'morethuente' (strong-Wolfe, the reference's
    default — train_lbfgs.c linesearch=MoreThuente) or 'backtracking'
    (Armijo). OWL-QN always uses the projected backtracking search,
    exactly like the reference which FORCES Backtracking whenever
    orthantwise_c > 0 (train_lbfgs.c:288-294)."""
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
        step0 = 1.0 if s_hist else min(1.0, 1.0 / max(1e-12, float(np.linalg.norm(g_eff))))
        f_new, g_new = f, g
        ok = False
        if l1_c == 0.0 and linesearch == "morethuente":
            # strong-Wolfe Moré-Thuente (reference default line search)
            cache = {}

            def phi(stp):
                xs = x + stp * d
                fs, gs = fun_grad(xs)
                cache[stp] = (xs, fs, gs)
                return fs, float(gs @ d)

            step, f_ls, _, ok = _more_thuente(
                phi, f, dg, step0, max_linesearch=max_linesearch
            )
            if ok:
                x_new, f_new, g_new = cache[step]
        else:
            # --- Armijo backtracking (projected when OWL-QN) ---
            step = step0
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
