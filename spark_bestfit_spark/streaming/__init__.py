"""Structured Streaming extensions.

The reference engine has no streaming operators (SURVEY §2.11); its
drift-detection use case (examples/spark/usecase_drift_detection.ipynb)
is repeated batch fits. This package provides the Spark-native version:
``foreachBatch`` re-fitting with K-S drift scoring against a reference
model, plus windowed streaming statistics.
"""

from spark_bestfit_spark.streaming.drift import (
    CertifiedDriftMonitor,
    CertifiedDriftMonitorByGroup,
    CertifiedDriftRecord,
    GroupedCertifiedDriftRecord,
    DriftMonitor,
    ks_drift_score,
    w1_drift_score,
)
from spark_bestfit_spark.streaming.stateful import streaming_moments
from spark_bestfit_spark.streaming.windows import (
    session_stats,
    windowed_stats,
)

__all__ = [
    "CertifiedDriftMonitor", "CertifiedDriftMonitorByGroup",
    "CertifiedDriftRecord", "GroupedCertifiedDriftRecord", "DriftMonitor",
    "ks_drift_score", "w1_drift_score", "streaming_moments",
    "windowed_stats", "session_stats",
]
