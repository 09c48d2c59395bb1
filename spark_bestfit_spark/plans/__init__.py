"""Logical-plan-level objects: fit configuration and partition planning."""
