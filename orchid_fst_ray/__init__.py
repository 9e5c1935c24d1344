"""orchid_fst_ray — a Ray-Data-native entity-resolution / data-processing
engine whose blocking core reimplements Orchid-FST's finite-state-transducer
dictionary semantics (exact / prefix / range / fuzzy search over UTF-8 keys).

Layout:
- ``fst/``       pure-Python/numpy FST core (no Ray dependency)
- ``stages/``    Ray Data map_batches / actor-pool stages
- ``sources/``   readers (parquet with pruning, dictionary text)
- ``functions/`` vectorized kernels (similarity, text, hashing)
- ``pipelines/`` end-to-end pipelines (entity resolution, dedup) + fixtures
- ``state/``     checkpoint / lineage / metrics
"""

__version__ = "0.1.0"
