"""Distribution base classes: loc/scale algebra, generic MLE, numeric PPF.

Design (re-expressed from the behavior of scipy.stats as the reference uses
it — /root/reference/src/spark_bestfit/estimation.py:583-736 calls
``dist.fit`` / ``dist.logpdf`` / ``dist.cdf`` / ``dist.ppf`` with params
``(*shapes, loc, scale)``):

- subclasses implement standard-form ``_logpdf`` / ``_cdf`` (and ``_ppf``
  when a closed form exists) on ``z = (x - loc) / scale``;
- the base class provides the public loc/scale API, penalized negative
  log-likelihood, a Nelder-Mead ``fit`` with per-distribution starting
  values, and a bisection PPF fallback;
- fitting failures must never raise out of ``fit`` — callers encode
  failures as sentinel rows (SURVEY §2 O17).
"""

from __future__ import annotations

import numpy as np

from spark_bestfit_spark.functions.optimize import nelder_mead

_BIG = 1e12
_LOG_EPS = 1e-300


class ContinuousDistribution:
    """Base class for continuous distributions.

    Class attributes subclasses set:
      name: registry name (scipy-compatible where applicable)
      shapes: tuple of shape-parameter names (may be empty)
      shape_pos: tuple of bools — True if that shape must be > 0
      a, b: support of the standard form (may depend on shapes via
            ``_get_support``)
    """

    name: str = "base"
    shapes: tuple = ()
    shape_pos: tuple = ()
    a: float = -np.inf
    b: float = np.inf

    def __init__(self):
        if not self.shape_pos:
            self.shape_pos = tuple(True for _ in self.shapes)

    # ---------------------------------------------------------------- core
    @property
    def numargs(self) -> int:
        return len(self.shapes)

    @property
    def n_params(self) -> int:
        return self.numargs + 2

    def param_names(self) -> list:
        return list(self.shapes) + ["loc", "scale"]

    def _split(self, params):
        params = tuple(float(p) for p in params)
        k = self.numargs
        if len(params) == k:  # shapes only -> standard loc/scale
            return params, 0.0, 1.0
        if len(params) != k + 2:
            raise ValueError(
                f"{self.name}: expected {k + 2} params, got {len(params)}"
            )
        return params[:k], params[k], params[k + 1]

    def _get_support(self, *shapes):
        return self.a, self.b

    def _check_shapes(self, shapes) -> bool:
        for s, pos in zip(shapes, self.shape_pos):
            if not np.isfinite(s):
                return False
            if pos and s <= 0:
                return False
        return True

    # ------------------------------------------------- standard-form hooks
    def _pdf(self, z, *shapes):
        with np.errstate(over="ignore", under="ignore"):
            return np.exp(self._logpdf(z, *shapes))

    def _logpdf(self, z, *shapes):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(self._pdf(z, *shapes))

    def _cdf(self, z, *shapes):
        raise NotImplementedError

    def _sf(self, z, *shapes):
        return 1.0 - self._cdf(z, *shapes)

    def _logsf(self, z, *shapes):
        with np.errstate(divide="ignore"):
            return np.log(np.clip(self._sf(z, *shapes), _LOG_EPS, None))

    def _ppf(self, q, *shapes):
        return self._ppf_numeric(q, *shapes)

    def _isf(self, q, *shapes):
        return self._ppf(1.0 - np.asarray(q, dtype=np.float64), *shapes)

    def _cdf_quadrature(
        self, z, shapes, lo: float, hi: float, n: int = 4097
    ):
        """CDF by cumulative trapezoid of ``_pdf`` over [lo, hi] + interp.

        For densities whose CDF has no tractable closed form (NIG, Rice
        at large noncentrality): one vectorized pass over an n-point
        grid, then linear interpolation at the query points."""
        z = np.atleast_1d(np.asarray(z, dtype=np.float64))
        grid = np.linspace(lo, hi, n)
        with np.errstate(over="ignore", under="ignore", divide="ignore"):
            pdf = np.exp(self._logpdf(grid, *shapes))
        pdf[~np.isfinite(pdf)] = 0.0
        dx = grid[1] - grid[0]
        cum = np.concatenate(
            ([0.0], np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * dx))
        )
        total = cum[-1]
        if total > 0:
            cum = cum / max(total, 1.0)  # normalize only overshoot
        return np.clip(np.interp(z, grid, cum), 0.0, 1.0)

    def _ppf_numeric(self, q, *shapes, iters: int = 90):
        """Vectorized bisection inversion of ``_cdf`` on the support."""
        q = np.atleast_1d(np.asarray(q, dtype=np.float64))
        lo_s, hi_s = self._get_support(*shapes)
        lo = np.full(q.shape, lo_s if np.isfinite(lo_s) else -1.0)
        hi = np.full(q.shape, hi_s if np.isfinite(hi_s) else 1.0)
        # Expand unbounded brackets geometrically
        if not np.isfinite(lo_s):
            for _ in range(80):
                mask = self._cdf(lo, *shapes) > q
                if not np.any(mask):
                    break
                lo[mask] = lo[mask] * 2.0 - 1.0
        if not np.isfinite(hi_s):
            for _ in range(80):
                mask = self._cdf(hi, *shapes) < q
                if not np.any(mask):
                    break
                hi[mask] = hi[mask] * 2.0 + 1.0
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            c = self._cdf(mid, *shapes)
            less = c < q
            lo = np.where(less, mid, lo)
            hi = np.where(less, hi, mid)
        out = 0.5 * (lo + hi)
        out[q <= 0.0] = lo_s
        out[q >= 1.0] = hi_s
        return out

    # ------------------------------------------------------- public API
    def logpdf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc, scale = self._split(params)
        out = np.full(np.shape(x), -np.inf)
        if scale <= 0 or not self._check_shapes(shapes):
            return out
        z = (x - loc) / scale
        lo, hi = self._get_support(*shapes)
        ok = (z >= lo) & (z <= hi) & np.isfinite(z)
        if np.any(ok):
            with np.errstate(all="ignore"):
                vals = self._logpdf(np.asarray(z)[ok], *shapes) - np.log(scale)
            out[ok] = vals
        return out

    def pdf(self, x, *params):
        with np.errstate(over="ignore", under="ignore"):
            return np.exp(self.logpdf(x, *params))

    def cdf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc, scale = self._split(params)
        if scale <= 0 or not self._check_shapes(shapes):
            return np.full(np.shape(x), np.nan)
        z = (x - loc) / scale
        lo, hi = self._get_support(*shapes)
        zc = np.clip(z, lo, hi)
        with np.errstate(all="ignore"):
            out = np.asarray(self._cdf(zc, *shapes), dtype=np.float64)
        out = np.where(z <= lo, 0.0, out)
        out = np.where(z >= hi, 1.0, out)
        return np.clip(out, 0.0, 1.0)

    def sf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc, scale = self._split(params)
        if scale <= 0 or not self._check_shapes(shapes):
            return np.full(np.shape(x), np.nan)
        z = (x - loc) / scale
        lo, hi = self._get_support(*shapes)
        zc = np.clip(z, lo, hi)
        with np.errstate(all="ignore"):
            out = np.asarray(self._sf(zc, *shapes), dtype=np.float64)
        out = np.where(z <= lo, 1.0, out)
        out = np.where(z >= hi, 0.0, out)
        return np.clip(out, 0.0, 1.0)

    def logsf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc, scale = self._split(params)
        if scale <= 0 or not self._check_shapes(shapes):
            return np.full(np.shape(x), np.nan)
        z = (x - loc) / scale
        lo, hi = self._get_support(*shapes)
        zc = np.clip(z, lo, hi)
        with np.errstate(all="ignore"):
            out = np.asarray(self._logsf(zc, *shapes), dtype=np.float64)
        out = np.where(z <= lo, 0.0, out)
        out = np.where(z >= hi, -np.inf, out)
        return out

    def ppf(self, q, *params):
        q = np.asarray(q, dtype=np.float64)
        shapes, loc, scale = self._split(params)
        if scale <= 0 or not self._check_shapes(shapes):
            return np.full(np.shape(q), np.nan)
        with np.errstate(all="ignore"):
            z = np.asarray(self._ppf(np.clip(q, 0.0, 1.0), *shapes))
        out = loc + scale * z
        out = np.where((q < 0) | (q > 1), np.nan, out)
        return out

    def isf(self, q, *params):
        return self.ppf(1.0 - np.asarray(q, dtype=np.float64), *params)

    def rvs(self, params, size: int, random_state=None):
        rng = (
            random_state
            if isinstance(random_state, np.random.Generator)
            else np.random.default_rng(random_state)
        )
        u = rng.uniform(0.0, 1.0, size=size)
        return self.ppf(u, *params)

    def mean(self, *params):
        """Numeric mean via quadrature on the PPF (override for speed)."""
        qs = (np.arange(10_000) + 0.5) / 10_000
        vals = self.ppf(qs, *params)
        return float(np.mean(vals[np.isfinite(vals)]))

    def support(self, *params):
        shapes, loc, scale = self._split(params)
        lo, hi = self._get_support(*shapes)
        return loc + scale * lo, loc + scale * hi

    # ------------------------------------------------------------- fitting
    def nnlf(self, params, data) -> float:
        """Penalized negative log-likelihood (finite for bad params)."""
        try:
            shapes, loc, scale = self._split(params)
        except ValueError:
            return _BIG
        n = data.size
        if scale <= 0 or not self._check_shapes(shapes):
            return _BIG
        z = (data - loc) / scale
        lo, hi = self._get_support(*shapes)
        inside = (z >= lo) & (z <= hi)
        n_bad = int(n - np.count_nonzero(inside))
        with np.errstate(all="ignore"):
            lp = self._logpdf(z[inside], *shapes)
        # Cap unbounded densities at support edges so they can't dominate
        lp = np.minimum(lp, 700.0)
        finite = np.isfinite(lp)
        n_bad += int(np.count_nonzero(~finite))
        ll = float(np.sum(lp[finite]))
        nll = -ll + (n - n_bad) * np.log(scale)
        # ~log(DBL_MAX) per out-of-support point, scipy-style penalization
        return nll + n_bad * 709.0

    def _fit_start(self, data):
        """Heuristic full-parameter starting point; subclasses override."""
        loc = float(np.min(data))
        scale = float(np.std(data)) or 1.0
        lo, hi = self.a, self.b
        if np.isfinite(lo) and np.isfinite(hi):
            rng = float(np.max(data) - np.min(data)) or 1.0
            loc = float(np.min(data)) - 0.01 * rng
            scale = rng * 1.02 / (hi - lo)
        elif np.isfinite(lo):
            rng = float(np.max(data) - np.min(data)) or 1.0
            loc = float(np.min(data)) - lo * scale - 0.01 * rng
            scale = float(np.std(data)) or 1.0
        else:
            loc = float(np.mean(data))
        return tuple([1.0] * self.numargs) + (loc, scale)

    def _transform(self, full_params):
        """Map params into the unconstrained NM space (log for positives)."""
        out = []
        for v, pos in zip(full_params[: self.numargs], self.shape_pos):
            out.append(np.log(max(v, 1e-12)) if pos else v)
        out.append(full_params[-2])  # loc
        out.append(np.log(max(full_params[-1], 1e-12)))  # scale
        return np.array(out, dtype=np.float64)

    def _untransform(self, theta):
        out = []
        for v, pos in zip(theta[: self.numargs], self.shape_pos):
            out.append(float(np.exp(v)) if pos else float(v))
        out.append(float(theta[-2]))
        out.append(float(np.exp(theta[-1])))
        return tuple(out)

    def _fit_closed(self, data):
        """Closed-form MLE; return None when not available."""
        return None

    def fit(self, data, maxiter: int | None = None, start=None):
        """Full MLE over (shapes, loc, scale). Returns a params tuple.

        ``start``: optional warm-start params (full tuple incl. loc and
        scale) — e.g. bootstrap refits start at the point estimate, so
        the simplex converges in a fraction of the cold-start budget.
        Ignored when a closed-form MLE exists (exact and cheaper)."""
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        if data.size < 2:
            raise ValueError(f"{self.name}.fit needs >= 2 finite points")
        closed = self._fit_closed(data)
        if closed is not None:
            return tuple(float(v) for v in closed)
        warm = start is not None
        start = tuple(start) if warm else self._fit_start(data)

        # The NM objective only needs a statistically representative sample;
        # past ~5k points extra data slows every evaluation without moving
        # the optimum materially (the fitting sample is already randomized).
        # Kernels with expensive per-point series (nct) lower the cap via
        # _obj_subsample — their optimum is equally stable at 2k points
        # and the evaluation cost is linear in n.
        cap = getattr(self, "_obj_subsample", 5000)
        obj_data = data if data.size <= cap else data[:: data.size // cap + 1]

        def objective(theta):
            return self.nnlf(self._untransform(theta), obj_data)

        theta0 = self._transform(start)
        # kernels with expensive per-eval series can bound their NM
        # budget via _fit_maxiter — iterations beyond ~200 only polish
        # the optimum, and a 3 s straggler gates the whole fan-out wave.
        # A caller-supplied warm start sits near the optimum already:
        # shrink the initial simplex and halve the budget so convergence
        # is a local polish, not a fresh search.
        default_iters = getattr(self, "_fit_maxiter", 150 * theta0.size)
        if warm:
            default_iters = max(40, default_iters // 2)
        best_theta, best_f, _ = nelder_mead(
            objective,
            theta0,
            maxiter=maxiter or default_iters,
            xatol=1e-4,
            fatol=1e-4,
            initial_step=0.02 if warm else 0.1,
        )
        if not np.isfinite(best_f) or best_f >= _BIG:
            # fall back to the start if optimization never found support
            return tuple(float(v) for v in start)
        return self._untransform(best_theta)


class DiscreteDistribution:
    """Base class for discrete (integer-support) distributions.

    Params are ``(*shapes, loc)`` with integer shift ``loc``; the standard
    form lives on integers k in [a, b].
    """

    name: str = "base_discrete"
    shapes: tuple = ()
    # per-shape spec: ("pos" | "real" | "unit" | "int"), unit = (0,1)
    shape_kind: tuple = ()
    a: float = 0.0
    b: float = np.inf

    def __init__(self):
        if not self.shape_kind:
            self.shape_kind = tuple("pos" for _ in self.shapes)

    @property
    def numargs(self) -> int:
        return len(self.shapes)

    @property
    def n_params(self) -> int:
        return self.numargs + 1

    def param_names(self) -> list:
        return list(self.shapes) + ["loc"]

    def _split(self, params):
        params = tuple(float(p) for p in params)
        k = self.numargs
        if len(params) == k:
            return params, 0.0
        if len(params) != k + 1:
            raise ValueError(
                f"{self.name}: expected {k + 1} params, got {len(params)}"
            )
        return params[:k], params[k]

    def _get_support(self, *shapes):
        return self.a, self.b

    def _check_shapes(self, shapes) -> bool:
        for s, kind in zip(shapes, self.shape_kind):
            if not np.isfinite(s):
                return False
            if kind == "pos" and s <= 0:
                return False
            if kind == "unit" and not (0.0 < s < 1.0):
                return False
            if kind == "int" and (s < 0 or s != np.floor(s)):
                return False
        return True

    # hooks
    def _logpmf(self, k, *shapes):
        with np.errstate(divide="ignore"):
            return np.log(np.clip(self._pmf(k, *shapes), _LOG_EPS, None))

    def _pmf(self, k, *shapes):
        with np.errstate(over="ignore", under="ignore"):
            return np.exp(self._logpmf(k, *shapes))

    def _cdf(self, k, *shapes):
        """Default: brute-force partial sums (fine for modest supports)."""
        k = np.atleast_1d(k)
        lo, hi = self._get_support(*shapes)
        kmax = int(np.max(k)) if k.size else 0
        grid = np.arange(int(lo), max(int(lo), kmax) + 1)
        pmf = self._pmf(grid, *shapes)
        csum = np.cumsum(pmf)
        idx = np.clip(k.astype(np.int64) - int(lo), -1, csum.size - 1)
        out = np.where(idx < 0, 0.0, csum[np.clip(idx, 0, None)])
        return np.clip(out, 0.0, 1.0)

    def _sf(self, k, *shapes):
        return 1.0 - self._cdf(k, *shapes)

    def _ppf(self, q, *shapes, search_cap: int = 10_000_000):
        """Smallest k with CDF(k) >= q, via doubling + binary search."""
        q = np.atleast_1d(np.asarray(q, dtype=np.float64))
        lo_s, _ = self._get_support(*shapes)
        if np.isfinite(lo_s):
            lo = np.full(q.shape, int(lo_s) - 1, dtype=np.float64)
            hi = np.full(q.shape, max(int(lo_s), 1), dtype=np.float64)
        else:
            lo = np.full(q.shape, -2.0)
            hi = np.full(q.shape, 2.0)
            for _ in range(64):
                mask = self._cdf(lo, *shapes) > q
                if not np.any(mask):
                    break
                lo[mask] = lo[mask] * 2.0 - 1.0
        for _ in range(64):
            mask = self._cdf(hi, *shapes) < q
            if not np.any(mask) or np.all(hi > search_cap):
                break
            hi[mask] = hi[mask] * 2 + 1
        for _ in range(64):
            mid = np.floor((lo + hi) / 2.0)
            done = np.all(hi - lo <= 1)
            if done:
                break
            c = self._cdf(mid, *shapes)
            less = c < q
            lo = np.where(less, mid, lo)
            hi = np.where(less, hi, mid)
        return hi

    # public API
    def logpmf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc = self._split(params)
        out = np.full(np.shape(x), -np.inf)
        if not self._check_shapes(shapes):
            return out
        k = x - loc
        lo, hi = self._get_support(*shapes)
        ok = (k >= lo) & (k <= hi) & (k == np.floor(k)) & np.isfinite(k)
        if np.any(ok):
            with np.errstate(all="ignore"):
                out[ok] = self._logpmf(np.asarray(k)[ok], *shapes)
        return out

    def pmf(self, x, *params):
        with np.errstate(over="ignore", under="ignore"):
            return np.exp(self.logpmf(x, *params))

    def cdf(self, x, *params):
        x = np.asarray(x, dtype=np.float64)
        shapes, loc = self._split(params)
        if not self._check_shapes(shapes):
            return np.full(np.shape(x), np.nan)
        k = np.floor(x - loc)
        lo, hi = self._get_support(*shapes)
        kc = np.clip(k, lo - 1, hi)
        with np.errstate(all="ignore"):
            out = np.asarray(self._cdf(kc, *shapes), dtype=np.float64)
        out = np.where(k < lo, 0.0, out)
        out = np.where(k >= hi, 1.0, out)
        return np.clip(out, 0.0, 1.0)

    def sf(self, x, *params):
        return 1.0 - self.cdf(x, *params)

    def ppf(self, q, *params):
        q = np.asarray(q, dtype=np.float64)
        shapes, loc = self._split(params)
        if not self._check_shapes(shapes):
            return np.full(np.shape(q), np.nan)
        with np.errstate(all="ignore"):
            k = self._ppf(np.clip(q, 0.0, 1.0), *shapes)
        return k + loc

    def rvs(self, params, size: int, random_state=None):
        rng = (
            random_state
            if isinstance(random_state, np.random.Generator)
            else np.random.default_rng(random_state)
        )
        u = rng.uniform(0.0, 1.0, size=size)
        return self.ppf(u, *params)

    def nnlf(self, params, data) -> float:
        try:
            shapes, loc = self._split(params)
        except ValueError:
            return _BIG
        if not self._check_shapes(shapes):
            return _BIG
        with np.errstate(all="ignore"):
            lp = self.logpmf(data, *params)
        finite = np.isfinite(lp)
        n_bad = int(np.count_nonzero(~finite))
        return -float(np.sum(lp[finite])) + n_bad * 709.0

    def fit(self, data, fix_loc: bool = True):
        """MLE via Nelder-Mead over transformed shapes (loc fixed to 0 or
        estimated as min(data) - support_lo)."""
        data = np.asarray(data, dtype=np.float64)
        data = data[np.isfinite(data)]
        data = np.floor(data)
        if data.size < 2:
            raise ValueError(f"{self.name}.fit needs >= 2 points")
        start = self._fit_start(data)
        loc0 = start[-1]

        def to_theta(shapes):
            out = []
            for v, kind in zip(shapes, self.shape_kind):
                if kind == "pos":
                    out.append(np.log(max(v, 1e-10)))
                elif kind == "unit":
                    p = min(max(v, 1e-10), 1 - 1e-10)
                    out.append(np.log(p / (1 - p)))
                else:
                    out.append(float(v))
            return np.asarray(out)

        def from_theta(theta):
            out = []
            for v, kind in zip(theta, self.shape_kind):
                if kind == "pos":
                    out.append(float(np.exp(v)))
                elif kind == "unit":
                    out.append(float(1.0 / (1.0 + np.exp(-v))))
                elif kind == "int":
                    out.append(float(max(0.0, np.round(v))))
                else:
                    out.append(float(v))
            return tuple(out)

        def objective(theta):
            return self.nnlf(from_theta(theta) + (loc0,), data)

        theta0 = to_theta(start[: self.numargs])
        if theta0.size == 0:
            return (loc0,)
        best_theta, best_f, _ = nelder_mead(objective, theta0)
        if not np.isfinite(best_f) or best_f >= _BIG:
            return tuple(start[: self.numargs]) + (loc0,)
        return from_theta(best_theta) + (loc0,)

    def _fit_start(self, data):
        """Return (*shape_starts, loc). Subclasses override."""
        return tuple([1.0] * self.numargs) + (0.0,)
