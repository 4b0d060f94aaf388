"""The frontier microbenchmark is a BENCH surface, but its survivor
counts are exactly predictable from the generator spec — so the whole
dedup → seen-check → seal loop is correctness-pinned here, independent
of the crawl tests (SURVEY.md §5: spec-derived oracles)."""

import numpy as np

from olx_ray.pipelines.frontier_bench import (DUP_EVERY, _round_keys,
                                              expected_survivors,
                                              run_frontier_rounds,
                                              synth_candidates)


def test_frontier_rounds_survivors_match_spec(ray_session):
    n, rounds = 4_000, 3
    out = run_frontier_rounds(n, n_rounds=rounds, n_shards=4)
    want = [expected_survivors(n, r) for r in range(rounds)]
    assert out["frontier_survivors"] == want
    assert out["frontier_rows"] == n * rounds
    # sanity on the spec itself: round 0 loses exactly the within-round
    # duplicates; later rounds also lose the revisited prefix
    assert want[0] == n - (n - 1) // DUP_EVERY
    assert 0 < want[1] < want[0]
    assert out["frontier_rows_per_sec"] > 0


def test_frontier_generator_is_deterministic(ray_session):
    # sort by seq: the CONTENT is deterministic; block arrival order is
    # not (preserve_order defaults off and a busy cluster reorders)
    def rows(ds):
        return ds.to_pandas().sort_values("discovered_seq") \
            .reset_index(drop=True)

    a = rows(synth_candidates(1_000, 1))
    b = rows(synth_candidates(1_000, 1))
    assert a.equals(b)
    # revisit overlap: round 1 shares exactly the expected keys with
    # round 0 (cross-round seen hits are real, not hash accidents)
    r0 = set(synth_candidates(1_000, 0).to_pandas()["url_hash"])
    overlap = sum(h in r0 for h in a["url_hash"])
    i = np.arange(1_000, dtype=np.int64)
    adj = ((i % DUP_EVERY == 0) & (i > 0)).astype(np.int64)
    k0 = np.unique(_round_keys(1_000, 0, 0.3) + i - adj)
    k1 = _round_keys(1_000, 1, 0.3) + i - adj
    assert overlap == int(np.isin(k1, k0).sum())
