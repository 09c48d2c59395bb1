"""Probability distribution library (pure NumPy, scipy-compatible conventions).

Parameters follow the scipy.stats convention: ``params = (*shapes, loc,
scale)`` for continuous distributions and ``(*shapes, loc)`` for discrete
ones, with the standardized variable ``z = (x - loc) / scale``.
"""

from spark_bestfit_spark.functions.distributions.base import (  # noqa: F401
    ContinuousDistribution,
    DiscreteDistribution,
)
from spark_bestfit_spark.functions.distributions.registry import (  # noqa: F401
    DistributionRegistry,
    get_continuous,
    get_discrete,
    get_distribution,
)
