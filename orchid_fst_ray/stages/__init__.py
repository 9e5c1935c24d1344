"""Ray Data stages: batch transforms and actor-pool stages composing the
engine's pipelines."""
