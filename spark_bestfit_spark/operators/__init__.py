"""Distributed (Spark-side) operators."""
