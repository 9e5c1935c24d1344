"""Checkpoint / lineage / metrics for resumable pipeline runs."""
