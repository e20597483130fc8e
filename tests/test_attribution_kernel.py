"""Property tests for the q89 cogrouped-attribution kernel.

The kernel must bit-match a direct per-purchase transcription of the
oracle SQL (clicks with ``c_ts >= p_ts - 600s AND c_ts < p_ts`` for the
same user; gap = second-boundary count to the latest such click) on
ARBITRARY inputs — specifically the three classes the round-5 review
flagged:

- snowflake-scale user ids (>= 2**29, up to full int64 range) — the old
  composite ``user * 2**34 + epoch`` key overflowed silently there;
- sub-second-dense event streams, including pairs straddling a shared
  second and the exact 600 s window boundary — the old kernel compared
  second-floored epochs while the oracle compares microseconds;
- buckets with purchases but zero clicks — the old ``np.where`` gather
  raised IndexError on the empty click array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from sbs_suptech_etl_v2_spark.operators.relational import (
    COGROUP_WINDOW_S,
    _attribution_kernel,
)

_W_US = COGROUP_WINDOW_S * 1_000_000

# Timestamps as epoch microseconds in a ~2-hour band around a fixed
# origin, so window-straddling pairs are common; ids span the full
# positive int64 range to exercise overflow.
_ORIGIN_US = 1_722_470_400_000_000  # 2024-08-01T00:00:00Z
_ts_us = st.integers(min_value=_ORIGIN_US, max_value=_ORIGIN_US + 7_200_000_000)
_user = st.integers(min_value=0, max_value=(1 << 62))

_clicks = st.lists(st.tuples(_user, _ts_us), max_size=60)
_purchases = st.lists(st.tuples(_user, _ts_us), max_size=40)


def _frame_clicks(rows: list[tuple[int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": np.zeros(len(rows), dtype="int32"),
            "user_id": np.array([u for u, _ in rows], dtype="int64"),
            "c_ts": pd.to_datetime(
                np.array([t for _, t in rows], dtype="int64"), unit="us"
            ),
        }
    )


def _frame_purchases(rows: list[tuple[int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": np.zeros(len(rows), dtype="int32"),
            "user_id": np.array([u for u, _ in rows], dtype="int64"),
            "purchase_id": np.arange(len(rows), dtype="int64"),
            "p_ts": pd.to_datetime(
                np.array([t for _, t in rows], dtype="int64"), unit="us"
            ),
        }
    )


def _reference(
    clicks: list[tuple[int, int]], purchases: list[tuple[int, int]]
) -> list[tuple[int, float]]:
    """Per-purchase transcription of COGROUP_ATTRIBUTION_SQL."""
    out = []
    for u, pt in purchases:
        in_window = [
            ct for cu, ct in clicks if cu == u and pt - _W_US <= ct < pt
        ]
        if in_window:
            latest = max(in_window)
            out.append(
                (len(in_window), float(pt // 1_000_000 - latest // 1_000_000))
            )
        else:
            out.append((0, float("nan")))
    return out


@settings(max_examples=200, deadline=None)
@given(clicks=_clicks, purchases=_purchases)
def test_kernel_matches_oracle_transcription(clicks, purchases):
    got = _attribution_kernel(_frame_clicks(clicks), _frame_purchases(purchases))
    want = _reference(clicks, purchases)
    assert len(got) == len(want)
    # Kernel preserves purchase input order (purchase_id = input index).
    got = got.sort_values("purchase_id").reset_index(drop=True)
    for i, (n_ref, gap_ref) in enumerate(want):
        assert int(got["n_clicks_before"][i]) == n_ref, (i, clicks, purchases)
        gap = got["nearest_click_gap_s"][i]
        if np.isnan(gap_ref):
            assert np.isnan(gap), (i, clicks, purchases)
        else:
            assert gap == gap_ref, (i, clicks, purchases)


def test_purchases_with_zero_clicks_bucket():
    """Regression: empty click frame must not index into ck[...]."""
    got = _attribution_kernel(
        _frame_clicks([]), _frame_purchases([(5, _ORIGIN_US), (9, _ORIGIN_US + 7)])
    )
    assert list(got["n_clicks_before"]) == [0, 0]
    assert got["nearest_click_gap_s"].isna().all()


def test_snowflake_scale_ids_no_overflow():
    """Regression: user_id >= 2**29 overflowed the old composite key."""
    u1, u2 = (1 << 62) + 12345, (1 << 62) + 12346  # adjacent huge ids
    clicks = [(u1, _ORIGIN_US + 1_000_000), (u2, _ORIGIN_US + 2_000_000)]
    purchases = [(u1, _ORIGIN_US + 5_000_000), (u2, _ORIGIN_US + 1_500_000)]
    got = _attribution_kernel(_frame_clicks(clicks), _frame_purchases(purchases))
    got = got.sort_values("purchase_id").reset_index(drop=True)
    assert list(got["n_clicks_before"]) == [1, 0]
    assert got["nearest_click_gap_s"][0] == 4.0
    assert np.isnan(got["nearest_click_gap_s"][1])


def test_microsecond_boundaries():
    """Window edges compare at microseconds: a click exactly at
    p_ts - 600 s is IN the window; a click at p_ts is OUT; a click one
    microsecond before p_ts is IN with a second-truncated gap."""
    p = _ORIGIN_US + _W_US + 500_000  # xx:10:00.5
    clicks = [
        (1, p - _W_US),      # exactly at window start -> in
        (1, p - _W_US - 1),  # 1 us before window start -> out
        (2, p),              # exactly at purchase -> out
        (2, p - 1),          # 1 us before purchase -> in, same second
        (3, p - 600_000),    # 0.6 s before, straddles the second
    ]
    got = _attribution_kernel(
        _frame_clicks(clicks), _frame_purchases([(1, p), (2, p), (3, p)])
    ).sort_values("purchase_id").reset_index(drop=True)
    assert list(got["n_clicks_before"]) == [1, 1, 1]
    # user 1: gap = floor(p) - floor(p - 600s) = 600 exactly
    assert got["nearest_click_gap_s"][0] == 600.0
    # user 2: same second -> 0 boundaries crossed
    assert got["nearest_click_gap_s"][1] == 0.0
    # user 3: p at .5, click at .9 of previous second -> 1 boundary
    assert got["nearest_click_gap_s"][2] == 1.0
