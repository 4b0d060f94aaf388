"""Exact-decimal money arithmetic for oracle-parity aggregates.

The fixture money columns (prices, discounts, taxes, event values) are
exact 2-decimal values stored as doubles. Summing them as doubles
carries O(n·eps·|sum|) error, and when a true sum lands exactly on a
half-cent — probability ≈ 1 % per aggregate cell, observed live at
sf0.001 (q1's N/F sum_disc_price = …055.9650) — rounding the float
sum to 2 decimals becomes a COIN FLIP between engines: each engine's
summation order lands on its own side of the boundary. Green-by-luck,
red on the next regenerated dataset.

The fix is exact integer units end-to-end (the q1 pattern):

- ``cents(x)``   — exact 2-decimal doubles → int64 cents (the
  conversion is exact: x·100 is integer-valued within 1e-6);
- per-row derived units: ``cents · (100 − disc_cents)`` is exact 10⁻⁴
  units, one more factor for 10⁻⁶ — all int64 per batch;
- int64 sums ride the existing groupby/join machinery (a per-key or
  per-batch partial can't overflow: 131072 rows × ~10¹¹ ≈ 1.4×10¹⁶);
  GLOBAL folds convert to Python ints first (``object_sum``) so no
  scale overflows;
- ``units_to_currency`` rounds HALF-AWAY-FROM-ZERO in integer space
  and divides once — matching DuckDB's DECIMAL ``round()``.

Oracle twin: cast the source columns through ``DECIMAL(18,2)`` so SQL
sums are exact too, round the DECIMAL, cast to DOUBLE. Quotients
(averages, ratios) divide the identical exact sums as IEEE doubles on
both sides: a double quotient can never sit exactly on a half-cent
((2k+1)/200 is not dyadic), so rounding agrees by construction.
"""

from __future__ import annotations

import numpy as np


def cents(x) -> np.ndarray:
    """Exact 2-decimal doubles → int64 cents."""
    return np.rint(np.asarray(x, np.float64) * 100.0).astype(np.int64)


def units_to_currency(v, unit_decimals: int = 2):
    """Integer 10^-unit_decimals units → float currency rounded
    half-away-from-zero at 2 decimals. int64 ndarrays round fully
    vectorized (the hot per-key path — q3's per-order / q10's
    per-customer rows); Python-int iterables take the exact
    arbitrary-precision path (global folds); scalars work too."""
    div = 10 ** (unit_decimals - 2)
    half = div // 2

    if isinstance(v, np.ndarray) and v.dtype.kind in "iu":
        c = np.where(v >= 0, (v + half) // div, -((-v + half) // div))
        return c.astype(np.float64) / 100.0

    def one(u) -> float:
        u = int(u)
        c = (u + half) // div if u >= 0 else -((-u + half) // div)
        return c / 100.0

    if np.isscalar(v) or isinstance(v, (int, np.integer)):
        return one(v)
    return np.array([one(u) for u in v], dtype=np.float64)


def round_half_away(x, decimals: int = 2):
    """HALF-AWAY-FROM-ZERO rounding of doubles — bit-identical to
    DuckDB's ``round(x::DOUBLE, d)`` (verified on 3k+ adversarial
    values including exact scaled-.5 ties). numpy/pandas ``round`` is
    half-EVEN: on a quotient double whose ×10^d product lands exactly
    on .5 (e.g. 0.005 → ×100 → exactly 0.5) the two disagree —
    np.round(0.005, 2) = 0.0, DuckDB = 0.01 — so every oracle-checked
    AVERAGE/RATIO must round through this, not .round()."""
    m = 10.0 ** decimals
    x = np.asarray(x, np.float64)
    out = np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m
    return float(out) if out.ndim == 0 else out


def object_sum(series) -> int:
    """Arbitrary-precision sum of an integer series (for GLOBAL folds
    whose int64 total could overflow at extreme scale)."""
    return sum(int(v) for v in series)
