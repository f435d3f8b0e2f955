"""searchengine_ray — a Ray-Data-native rebuild of the query/data-processing
capabilities of ``vctruong100/searchengine`` (reference, read-only at
/root/reference).

Built from scratch on ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, ``groupby`` shuffles
for the wide steps (posting-list construction, dedup, link-graph rounds), and
partitioned Parquet for every persisted artifact.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the session
is owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.6.0"  # 0.6.0: fused docs/texts/edges execution + block-task stats (same outputs; cache hygiene)
