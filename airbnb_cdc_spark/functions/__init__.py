"""Reusable Catalyst-native expression helpers (zero Python UDFs)."""
