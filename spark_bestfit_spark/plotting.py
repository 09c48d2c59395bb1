"""Diagnostics plotting (reference plotting.py surface).

matplotlib is optional — every plot function raises a clear ImportError
when it is missing. The numeric preparation (histogram overlays, Q-Q /
P-P points with Blom plotting positions, residuals, CDF comparison
curves) is factored into ``*_data`` helpers that work without matplotlib
so diagnostics remain testable and usable headless.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment-dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAS_MPL = True
except ImportError:  # pragma: no cover
    plt = None
    _HAS_MPL = False

__all__ = [
    "blom_positions",
    "qq_data",
    "pp_data",
    "residual_data",
    "cdf_comparison_data",
    "comparison_data",
    "discrete_pmf_data",
    "plot_distribution",
    "plot_comparison",
    "plot_discrete_distribution",
    "plot_qq",
    "plot_pp",
    "plot_cdf_comparison",
    "plot_residual_histogram",
    "plot_diagnostics",
]


def _require_mpl() -> None:
    if not _HAS_MPL:
        raise ImportError(
            "matplotlib is required for plotting; install it or use the "
            "*_data helpers for headless diagnostics"
        )


def blom_positions(n: int) -> np.ndarray:
    """Blom plotting positions (i - 3/8) / (n + 1/4) (reference
    plotting.py:101)."""
    i = np.arange(1, n + 1)
    return (i - 0.375) / (n + 0.25)


def qq_data(result, data: np.ndarray) -> tuple:
    """(theoretical_quantiles, ordered_data) for a Q-Q plot."""
    x = np.sort(np.asarray(data, dtype=np.float64))
    x = x[np.isfinite(x)]
    q = blom_positions(x.size)
    theo = np.asarray(result.ppf(q), dtype=np.float64)
    return theo, x


def pp_data(result, data: np.ndarray) -> tuple:
    """(theoretical_cdf, empirical_cdf) for a P-P plot."""
    x = np.sort(np.asarray(data, dtype=np.float64))
    x = x[np.isfinite(x)]
    theo = np.asarray(result.cdf(x), dtype=np.float64)
    emp = blom_positions(x.size)
    return theo, emp


def residual_data(
    result, hist_density: np.ndarray, bin_edges: np.ndarray
) -> np.ndarray:
    """Per-bin density residuals (empirical - model)."""
    from spark_bestfit_spark.functions.metrics import expected_bin_density

    dist = result._dist()
    expected = expected_bin_density(
        dist, tuple(result.parameters), np.asarray(bin_edges)
    )
    return np.asarray(hist_density) - expected


def cdf_comparison_data(result, data: np.ndarray, points: int = 200) -> tuple:
    """(x_grid, model_cdf, ecdf_x, ecdf_y) for a CDF comparison plot."""
    x = np.sort(np.asarray(data, dtype=np.float64))
    x = x[np.isfinite(x)]
    grid = np.linspace(x[0], x[-1], points)
    model = np.asarray(result.cdf(grid), dtype=np.float64)
    ecdf_y = np.arange(1, x.size + 1) / x.size
    return grid, model, x, ecdf_y


def comparison_data(results, data: np.ndarray, points: int = 400) -> tuple:
    """(x_grid, {distribution_name: pdf_values}) for a multi-fit
    overlay (reference plot_comparison, plotting.py:409). The grid
    spans the finite data range; each candidate's PDF is evaluated on
    the shared grid so the curves are directly comparable."""
    if not results:
        raise ValueError("comparison_data needs at least one result")
    x = np.asarray(data, dtype=np.float64)
    x = x[np.isfinite(x)]
    if x.size == 0:
        raise ValueError("comparison_data needs finite data")
    grid = np.linspace(x.min(), x.max(), points)
    curves = {
        r.distribution: np.asarray(r.pdf(grid), dtype=np.float64)
        for r in results
    }
    return grid, curves


# distributions whose first parameter is an integer count — rounded
# before PMF evaluation (reference plotting.py:787-790)
_INT_PARAM_DISTS = frozenset(
    {"binom", "betabinom", "hypergeom", "nhypergeom", "boltzmann",
     "zipfian", "randint"}
)


def discrete_pmf_data(result, data: np.ndarray, pad: int = 2) -> tuple:
    """(unique_vals, empirical_pmf, x_range, theoretical_pmf) for a
    discrete PMF plot (reference plot_discrete_distribution,
    plotting.py:735): empirical PMF on the observed support, model PMF
    on the support padded by ``pad`` on both sides (clipped at 0 on
    the left, matching the reference)."""
    x = np.asarray(data, dtype=np.float64)
    x = x[np.isfinite(x)]
    if x.size == 0:
        raise ValueError("discrete_pmf_data needs non-empty data")
    ints = x.astype(np.int64)
    unique_vals, counts = np.unique(ints, return_counts=True)
    empirical = counts / ints.size
    params = list(result.parameters)
    if result.distribution in _INT_PARAM_DISTS and params:
        params[0] = int(round(params[0]))
    x_range = np.arange(
        max(0, unique_vals.min() - pad), unique_vals.max() + pad + 1
    )
    dist = result._dist()
    theoretical = np.asarray(
        dist.pmf(x_range, *params), dtype=np.float64
    )
    return unique_vals, empirical, x_range, theoretical


# ------------------------------------------------------------------ plots
def plot_distribution(
    result, data=None, bins: int = 50, ax=None,
    hist_density=None, bin_edges=None,
):
    """Histogram of the data with the fitted PDF overlaid. Accepts
    either raw ``data`` (driver-side histogram) or a precomputed
    (``hist_density``, ``bin_edges``) pair — the distributed
    histogram's output — so callers never re-collect a relation just
    to draw it."""
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    if hist_density is not None and bin_edges is not None:
        e = np.asarray(bin_edges, dtype=np.float64)
        ax.bar(
            0.5 * (e[:-1] + e[1:]), np.asarray(hist_density),
            width=np.diff(e), alpha=0.5, label="data",
        )
        lo, hi = e[0], e[-1]
    elif data is not None:
        x = np.asarray(data, dtype=np.float64)
        x = x[np.isfinite(x)]
        ax.hist(x, bins=bins, density=True, alpha=0.5, label="data")
        lo, hi = x.min(), x.max()
    else:
        raise ValueError(
            "plot_distribution needs data or (hist_density, bin_edges)"
        )
    grid = np.linspace(lo, hi, 400)
    ax.plot(grid, result.pdf(grid), "r-", label=f"{result.distribution} fit")
    ax.set_xlabel(result.column_name)
    ax.set_ylabel("density")
    ax.set_title(f"{result.column_name}: {result.distribution}")
    ax.legend()
    return ax


def plot_comparison(results, data, bins: int = 50, ax=None):
    """Multiple fitted PDFs overlaid on one data histogram (reference
    plot_comparison, plotting.py:409)."""
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    x = np.asarray(data, dtype=np.float64)
    x = x[np.isfinite(x)]
    ax.hist(x, bins=bins, density=True, alpha=0.4, label="data")
    grid, curves = comparison_data(results, x)
    for name, pdf in curves.items():
        ax.plot(grid, pdf, label=name, linewidth=2)
    ax.set_xlabel(results[0].column_name)
    ax.set_ylabel("density")
    ax.set_title(f"{results[0].column_name}: comparison")
    ax.legend()
    return ax


def plot_discrete_distribution(result, data, ax=None):
    """Empirical PMF bars with the fitted PMF as a stem overlay
    (reference plot_discrete_distribution, plotting.py:735)."""
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    vals, emp, x_range, theo = discrete_pmf_data(result, data)
    ax.bar(vals, emp, width=0.8, alpha=0.6, label="empirical PMF")
    markers, stems, _ = ax.stem(
        x_range, theo, linefmt="r-", markerfmt="ro", basefmt=" ",
        label="fitted PMF",
    )
    ax.set_xlabel(result.column_name)
    ax.set_ylabel("probability")
    ax.set_title(f"{result.column_name}: {result.distribution}")
    ax.legend()
    return ax


def plot_qq(result, data, ax=None):
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    theo, ordered = qq_data(result, data)
    ax.scatter(theo, ordered, s=8, alpha=0.6)
    lims = [min(theo[0], ordered[0]), max(theo[-1], ordered[-1])]
    ax.plot(lims, lims, "r--")
    ax.set_xlabel("theoretical quantiles")
    ax.set_ylabel("sample quantiles")
    ax.set_title(f"Q-Q: {result.distribution}")
    return ax


def plot_pp(result, data, ax=None):
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    theo, emp = pp_data(result, data)
    ax.scatter(theo, emp, s=8, alpha=0.6)
    ax.plot([0, 1], [0, 1], "r--")
    ax.set_xlabel("theoretical CDF")
    ax.set_ylabel("empirical CDF")
    ax.set_title(f"P-P: {result.distribution}")
    return ax


def plot_cdf_comparison(result, data, ax=None):
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    grid, model, ex, ey = cdf_comparison_data(result, data)
    ax.step(ex, ey, where="post", label="empirical")
    ax.plot(grid, model, "r-", label="model")
    ax.legend()
    ax.set_xlabel(result.column_name)
    ax.set_ylabel("cumulative probability")
    ax.set_title(f"CDF comparison: {result.distribution}")
    return ax


def plot_residual_histogram(result, hist_density, bin_edges, ax=None):
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    res = residual_data(result, hist_density, bin_edges)
    centers = 0.5 * (np.asarray(bin_edges)[:-1] + np.asarray(bin_edges)[1:])
    ax.bar(centers, res, width=np.diff(bin_edges), alpha=0.6)
    ax.axhline(0.0, color="r", linewidth=1)
    ax.set_ylabel("residual density")
    ax.set_title(f"density residuals: {result.distribution}")
    return ax


def plot_diagnostics(result, data, bins: int = 50):
    """2x2 panel: histogram+PDF, Q-Q, P-P, CDF comparison."""
    _require_mpl()
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    plot_distribution(result, data, bins=bins, ax=axes[0][0])
    plot_qq(result, data, ax=axes[0][1])
    plot_pp(result, data, ax=axes[1][0])
    plot_cdf_comparison(result, data, ax=axes[1][1])
    fig.tight_layout()
    return fig
