"""Column-level function library (pure Catalyst expressions where possible)."""
