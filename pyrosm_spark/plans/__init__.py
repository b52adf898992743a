"""Execution-plan utilities: checkpoint manifests, lineage, resume."""
