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
  (conformance + native modes), relational queries, events/windows,
  dedup (exact / minhash / simhash / n-gram / embedding / substring /
  semantic), similarity search (brute-force, LSH, IVF + partitioned
  layout), text analysis (lang-ID, quality, Gopher rules, boilerplate
  removal, TF-IDF, BM25), corpus prep (splits incl. leakage-safe,
  vocab, packing incl. interleaved multimodal, decontamination,
  mixing incl. temperature, DSIR selection), model-based scoring +
  perplexity filtering, BPE training, link-graph PageRank, sampling,
  multimodal decode, resumable export with compaction + data-skipping
  stats, and the composed ingestion round.
- ``olx_ray.state``      — bloom filter, checkpoint/lineage handling.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
process that owns the Ray session (bench.py, CLI, test fixture, the
driver) does.
"""

__version__ = "0.1.0"


def make_worker_log_silencer():
    """THE single implementation of the schema-hash-warning filter.

    Ray Data logs "Failed to hash the schemas (for deduplication)" per
    reduce task because ``pa.Table.from_pandas`` attaches ``b'pandas'``
    schema metadata whose hash raises in pyarrow 16 ("unhashable type:
    'dict'") — thousands of cosmetic lines per bench run that can bury
    real warnings. Only this one message is filtered; other warnings
    from the module stay visible.

    Returns a SELF-CONTAINED nested closure: cloudpickle serializes it
    BY VALUE, so it is usable as ``ray.init``'s
    ``worker_process_setup_hook`` — which unpickles before the job's
    sys.path reaches workers, where a module-level function (pickled by
    reference) would fail with ModuleNotFoundError."""

    def _silence():
        import logging

        class _Drop(logging.Filter):
            def filter(self, record: logging.LogRecord) -> bool:
                return ("Failed to hash the schemas"
                        not in record.getMessage())

        logging.getLogger(
            "ray.data._internal.arrow_ops.transform_pyarrow"
        ).addFilter(_Drop())

        class _DropEmptySchemaDivergence(logging.Filter):
            # Ray 2.49 warns "Operator produced a RefBundle with a
            # different schema ..." whenever a stage emits an EMPTY
            # block after non-empty ones (filter/repartition leave
            # zero-row bundles whose schema prints as ""/None). Those
            # are routine in the crawl loop's per-round filters; only
            # the empty-new-schema variant is dropped — a real
            # non-empty schema divergence still warns.
            def filter(self, record: logging.LogRecord) -> bool:
                msg = record.getMessage()
                if "produced a RefBundle with a different schema" not in msg:
                    return True
                return not (
                    "new schema: ." in msg
                    or "new schema: None." in msg
                    or "new schema: PandasBlockSchema(names=[], types=[])"
                       in msg)

        logging.getLogger(
            "ray.data._internal.execution.streaming_executor_state"
        ).addFilter(_DropEmptySchemaDivergence())

    return _silence


make_worker_log_silencer()()   # driver-side install at import
