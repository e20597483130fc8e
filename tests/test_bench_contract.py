"""Contract tests for the bench artifact line.

The external harness archives only a ~2 KB TAIL of bench.py's stdout.
Rounds 4–9 lost their per-query evidence to exactly this: the verbose
per-query maps pushed the line past the tail and the capture cut it
mid-JSON (BENCH_r09.json stores ``parsed: None``). The compact-line
format exists so that can never happen again — these tests pin it
against registry growth and careless edits:

- the line must parse as ONE self-contained JSON object;
- it must stay under 2 KB even at worst-case value magnitudes
  (4-digit centiseconds — a 99 s query — across all entries);
- the centisecond arrays must align 1:1 with sorted registry names,
  with ``null`` exactly where a query has no oracle (q43's uuid).

Pure-function tests (no SparkSession, no subprocess): build_artifact
is the single source of the printed dict.
"""

from __future__ import annotations

import json

from bench import build_artifact
from sbs_suptech_etl_v2_spark.registry import ORACLE, QUERIES

# the harness tail capture; the real bound is "~2 KB" — leave margin
TAIL_BYTES = 2048


def _artifact(per_query_sec: float):
    names = sorted(QUERIES)
    timings = {n: per_query_sec for n in names}
    oracle = {n: per_query_sec for n in ORACLE}
    return names, build_artifact(
        names, timings, oracle, 99.999, 99.999, 0.999, 0.1
    )


def test_line_fits_tail_at_worst_case_magnitudes():
    # 99 s per query = 4-digit centiseconds everywhere — far beyond
    # any observed driver box (worst real suite: ~82 s TOTAL)
    _, art = _artifact(99.0)
    line = json.dumps(art)
    assert len(line.encode()) <= TAIL_BYTES, (
        f"bench line is {len(line)} bytes; the harness tail keeps ~2 KB. "
        "Registry grew or a verbose field crept back in — trim the line "
        "or move the field to the .bench_archive/ file."
    )


def test_line_roundtrips_and_aligns_with_registry():
    names, art = _artifact(1.234)
    rt = json.loads(json.dumps(art))
    assert rt["metric"] == "total_query_wall_clock" and rt["unit"] == "sec"
    assert rt["n_queries"] == len(names) == len(rt["spark_cs"])
    assert len(rt["oracle_cs"]) == len(names)
    # cs encoding: 1.234 s -> 123 cs
    assert set(rt["spark_cs"]) == {123}
    # null exactly at the no-oracle queries, in sorted-name order
    no_oracle = {n for n in names if n not in ORACLE}
    assert no_oracle == {"q43_notification_ids"}
    for n, o in zip(names, rt["oracle_cs"]):
        assert (o is None) == (n in no_oracle), n
    assert rt["value"] == round(1.234 * len(names), 3)
    assert rt["spark_vs_oracle_ratio"] is not None
    assert rt["calibration"]["spark_job_floor_sec"] == 0.999


def test_no_oracle_side_is_optional():
    names = sorted(QUERIES)
    art = build_artifact(
        names, {n: 0.5 for n in names}, None, None, None, None, 0.001
    )
    assert art["oracle_cs"] is None
    assert art["oracle_suite_sec"] is None
    assert art["spark_vs_oracle_ratio"] is None
    assert json.loads(json.dumps(art))["value"] == round(0.5 * len(names), 3)
