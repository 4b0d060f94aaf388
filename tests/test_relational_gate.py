"""Size gate on the relational dimension joins (VERDICT r3 task 1).

Every dimension join in pipelines/relational.py must produce the SAME
answer on both sides of ``BROADCAST_ROW_CAP``: driver-load + broadcast
below it, bucket_semi / bucket_hash_join (no driver state) above it.
Lowering the cap to 0 forces the shuffle path on the tiny fixture and
pins output equality — the scale path is then exercised continuously,
not only the day customer/part outgrow the cap.
"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

GATED = ["q3_shipping_priority", "q5_supplier_volume",
         "q10_returned_revenue", "nation_order_stats",
         "part_type_volume", "q14_promo_revenue", "q18_large_orders"]


def _run(R, name):
    res = getattr(R, name)(SF)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_gate_selects_shuffle_above_cap():
    from olx_ray.pipelines import relational as R

    assert R._dim_small(SF, "customer")        # tiny fixture → broadcast
    old = R.BROADCAST_ROW_CAP
    try:
        R.BROADCAST_ROW_CAP = 0
        assert not R._dim_small(SF, "customer")
        assert not R._dim_small(SF, "part")
        assert not R._dim_small(SF, "supplier")
    finally:
        R.BROADCAST_ROW_CAP = old
    # the gate reads footer metadata only — counts must match the table
    import pyarrow.parquet as pq
    assert R._table_rows(SF, "nation") == \
        pq.read_table(f"{SF}/nation.parquet").num_rows


@pytest.mark.parametrize("name", GATED)
def test_shuffle_path_matches_broadcast(ray_session, name):
    """Identical output (values AND dtypes) on both sides of the gate."""
    from olx_ray.pipelines import relational as R

    base = _run(R, name)                        # broadcast (oracle-green)
    old = R.BROADCAST_ROW_CAP
    try:
        R.BROADCAST_ROW_CAP = 0                 # force bucketed shuffle
        got = _run(R, name)
    finally:
        R.BROADCAST_ROW_CAP = old
    pd.testing.assert_frame_equal(base, got, check_dtype=True)
    assert len(base) > 0
