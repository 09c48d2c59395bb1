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
    "plot_distribution",
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


# ------------------------------------------------------------------ plots
def plot_distribution(result, data, bins: int = 50, ax=None):
    """Histogram of the data with the fitted PDF overlaid."""
    _require_mpl()
    if ax is None:
        _, ax = plt.subplots()
    x = np.asarray(data, dtype=np.float64)
    x = x[np.isfinite(x)]
    ax.hist(x, bins=bins, density=True, alpha=0.5, label="data")
    grid = np.linspace(x.min(), x.max(), 400)
    ax.plot(grid, result.pdf(grid), "r-", label=f"{result.distribution} fit")
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
