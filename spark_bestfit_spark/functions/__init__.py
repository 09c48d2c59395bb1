"""Numeric kernel library (pure NumPy — no SciPy in this environment)."""
