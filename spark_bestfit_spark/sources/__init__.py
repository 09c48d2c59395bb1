"""Sources and sinks (SURVEY §2.1 S1-S6).

The engine never owns data ingestion — users hand it DataFrames — but
these helpers cover the surrounding lifecycle: reading the standard
table formats with pushdown-friendly projections, registering test
fixtures, persisting/reloading the fit-results relation, and a
file-based model artifact store for every serializable model type.
"""

from spark_bestfit_spark.sources.tables import (
    collect_column,
    create_distribution_table,
    read_table,
    register_tables,
)
from spark_bestfit_spark.sources.sinks import (
    load_model,
    read_results,
    save_model,
    write_results,
)

__all__ = [
    "read_table",
    "register_tables",
    "create_distribution_table",
    "collect_column",
    "write_results",
    "read_results",
    "save_model",
    "load_model",
]
