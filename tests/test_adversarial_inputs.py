"""Adversarial-value robustness — edge rows that are CERTAIN to exist
at corpus scale must not kill a stage.

The round-8 sweep that motivated this found 9 real crashes on a
5-row corpus containing: an empty / whitespace-only / single-char
document, a ZERO-NORM embedding (dead/padding vector), and a
zero-quantity full-discount lineitem —

* every similarity query (q24/q25/q41/q47/q71/q90/q93/q107) raised
  ANSI DIVIDE_BY_ZERO normalizing the zero vector — fixed by
  excluding zero-norm vectors on both engines plus a lazy when()
  guard on the division (Catalyst can fuse the projection into a
  predicate that evaluates before the filter);
* q89's cogroup kernel lost its user_id column under a count-only
  plan — a Spark DeduplicateRelations quirk when both cogroup sides
  share one cached DataFrame, fixed with an explicit self-alias.

``count()`` (not collect) is deliberate: it exercises the maximally
column-pruned plan, which is what exposed the q89 bug.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sbs_suptech_etl_v2_spark.io import TABLES
from sbs_suptech_etl_v2_spark.registry import QUERIES


@pytest.fixture(scope="module")
def adversarial_sf_dir(tmp_path_factory, sf_dir):
    dst = tmp_path_factory.mktemp("sf_adversarial")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        head = tbl.slice(0, min(5, tbl.num_rows)).to_pylist()
        if t == "documents" and head:
            head[0]["text"] = ""
            if len(head) > 1:
                head[1]["text"] = " "
            if len(head) > 2:
                head[2]["text"] = "x"
            # Rows a multilingual, long-tailed 100 TB corpus certainly
            # contains: multibyte UTF-8 (byte != char everywhere a
            # kernel touches bytes), a ~200 KB document (Arrow batch
            # with a fat string cell), and one giant unbroken token
            # (tokenizers that split on space get a single huge term).
            template = dict(head[0])
            big_id = max(r["doc_id"] for r in head) + 1
            for off, text in (
                (1, "mañana über 東京 emoción λόγος " * 40),
                (2, "palabra estándar línea año " * 8000),
                (3, "x" * 50000),
            ):
                row = dict(template)
                row["doc_id"] = big_id + off
                row["text"] = text
                row["n_chars"] = len(text)
                head.append(row)
            # a byte-identical duplicate row (botched backfill /
            # double-delivered file): engines must not crash on a
            # repeated primary key — dedup operators treat it as the
            # degenerate exact-duplicate, joins simply fan out
            head.append(dict(head[4]))
        if t == "events" and head:
            head.append(dict(head[0]))
        if t == "embeddings" and head:
            head[0]["embedding"] = [0.0] * len(head[0]["embedding"])
        if t == "lineitem" and head:
            head[0]["l_quantity"] = 0.0
            head[0]["l_discount"] = 1.0
        pq.write_table(
            pa.Table.from_pylist(head, schema=tbl.schema),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


def test_every_query_survives_adversarial_rows(spark, adversarial_sf_dir):
    failures = {}
    for name in sorted(QUERIES):
        try:
            QUERIES[name](spark, adversarial_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            first_line = (str(ex).splitlines() or [""])[0]
            failures[name] = f"{type(ex).__name__}: {first_line[:120]}"
    assert not failures, failures


def test_q89_count_equals_collect(spark, sf_dir):
    """Regression pin for the cogroup column-pruning bug: the
    count-only (pruned) plan must deliver the kernel its full input —
    before the self-alias fix, count() crashed with KeyError while
    collect() worked.
    """
    df = QUERIES["q89_cogroup_attribution"](spark, sf_dir)
    assert df.count() == len(df.collect())


def test_q103_hot_user_skew(spark, sf_dir, tmp_path):
    """VERDICT r17 #1 (q103 skew guard): the funnel's one user-keyed
    aggregate carries per-user click/purchase timestamp ARRAYS, so one
    pathological hot user concentrates its whole event history in a
    single aggregation buffer row (the old per-stage min-join form
    reduced to scalars via streaming partial aggs). Pin the behavior
    at a 10^5-event hot user: the query completes on a small-heap
    local session and the staged counts are exact.

    Data: user 1 (hot) = 1 view then ~50k clicks then ~50k purchases,
    strictly increasing ts -> converts through every stage; user 2 =
    clicks only -> no stage; user 3 = click BEFORE its only view ->
    view counts, click does not. Expected: v=2, c=1, p=1."""
    import datetime as dt

    from sbs_suptech_etl_v2_spark.operators.relational import funnel_conversion

    t0 = dt.datetime(2024, 1, 1)
    n_hot = 100_000
    rows_ts, rows_user, rows_type = [], [], []

    def add(user, typ, ts):
        rows_user.append(user)
        rows_type.append(typ)
        rows_ts.append(ts)

    add(1, "view", t0)
    for i in range(1, n_hot // 2):
        add(1, "click", t0 + dt.timedelta(seconds=i))
    for i in range(n_hot // 2, n_hot):
        add(1, "purchase", t0 + dt.timedelta(seconds=i))
    add(2, "click", t0)
    add(3, "click", t0)  # before user 3's first view -> must not count
    add(3, "view", t0 + dt.timedelta(seconds=5))
    n = len(rows_ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "user_id": pa.array(rows_user, pa.int64()),
            "event_type": pa.array(rows_type, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        r["stage_name"]: r["n_users"]
        for r in funnel_conversion(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": 2,
        "click_after_view": 1,
        "purchase_after_click": 1,
    }
