"""spark-bestfit-spark: a PySpark-native distribution-fitting analytics engine.

A from-scratch rebuild of the capabilities of ``dwsmith1983/spark-bestfit``
(reference studied read-only at /root/reference) expressed Spark-first:

- distributed histogram / stats aggregation (``width_bucket`` + ``groupBy``)
- broadcast + pandas-UDF parallel fitting of a library of probability
  distributions to numeric DataFrame columns
- goodness-of-fit ranking (SSE / AIC / BIC / K-S / A-D)
- a fluent results query surface (``best``, ``filter``, ``for_column``,
  ``summary``, ``quality_report``)
- synthetic-data generation (univariate, Gaussian copula, MVN, GMM) via
  ``mapInPandas``
- large-scale training-data pipeline operators (dedup, similarity search,
  text statistics) over document/embedding tables.

Everything numeric is pure NumPy (this environment has no SciPy): the
``functions.special`` module implements the classic special functions
(Lanczos log-gamma, incomplete gamma/beta, inverse normal CDF, ...) the
distribution library needs.
"""

__version__ = "0.1.0"

from spark_bestfit_spark.session import get_spark  # noqa: F401
