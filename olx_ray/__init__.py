"""olx_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference scraper (stanikol/olx, see SURVEY.md),
re-expressed as ``ray.data.Dataset`` pipelines:

- ``olx_ray.functions``  — pure, vectorizable kernels (HTML parse, URL
  canonicalization, hashing, text stats, minhash/simhash).
- ``olx_ray.stages``     — map_batches stage callables (stateless fns and
  stateful actor-pool classes: fetcher, politeness, seen-filter).
- ``olx_ray.sources``    — readers + the deterministic synthetic site
  generator that replaces the network in this sandbox.
- ``olx_ray.pipelines``  — end-to-end pipelines: the crawl-round loop
  (conformance + native modes), relational queries, dedup, similarity
  search, text analysis.
- ``olx_ray.state``      — bloom filter, checkpoint/lineage handling.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
process that owns the Ray session (bench.py, CLI, test fixture, the
driver) does.
"""

__version__ = "0.1.0"
