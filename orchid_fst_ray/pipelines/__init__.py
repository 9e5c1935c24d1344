"""End-to-end pipelines (entity resolution, dedup) and deterministic
test-fixture generators."""
