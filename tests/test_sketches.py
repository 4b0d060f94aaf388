"""KMV distinct-count sketch: exactness below capacity, accuracy above."""

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_kmv_exact_below_capacity(ray_session):
    """With fewer distinct keys than k the sketch holds every hash —
    the estimate must equal the exact distributed nunique."""
    from olx_ray.pipelines.relational import (union_distinct_keys,
                                              union_distinct_keys_approx)

    exact = union_distinct_keys(SF).to_pandas()["n_distinct"][0]
    est = union_distinct_keys_approx(SF).to_pandas()["n_distinct"][0]
    assert est == exact > 0


def test_kmv_estimate_within_bound(ray_session):
    """Force estimation (k << distinct): the deterministic hash makes
    the estimate reproducible; rel. error stays well inside the
    ~3/sqrt(k) high-probability bound."""
    from olx_ray.pipelines.relational import (union_distinct_keys,
                                              union_distinct_keys_approx)

    exact = union_distinct_keys(SF01).to_pandas()["n_distinct"][0]
    est = union_distinct_keys_approx(SF01, k=256).to_pandas()["n_distinct"][0]
    assert exact > 256            # estimation genuinely engaged
    assert abs(est - exact) / exact < 3 / (256 ** 0.5)
