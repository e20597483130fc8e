"""Skew-mitigation utilities — the 100 TB posture for hot keys.

First line of defense is AQE (``spark.sql.adaptive.skewJoin`` splits
oversized post-shuffle partitions at runtime — on in session.py).
These helpers cover the cases AQE cannot fix:

- **salted aggregation** — a single hot group key overwhelms one
  reducer even after map-side combine when the map-side hash table
  degrades (huge per-key state, e.g. collect_list). Two-phase
  re-aggregation over a synthetic salt bounds any reducer's share of a
  hot key to 1/n_salts.
- **salted join** — a hot join key floods one task. Replicate the
  small side once per salt and scatter the big side uniformly; AQE's
  skew-join split handles sort-merge joins, but a salted plan is the
  only option for hot keys inside aggregations-after-join or for
  engines/stages where AQE splitting is unavailable.

Salts are *row-stable*: ``pmod(hash(<all columns>), n)`` depends only
on row content, never on partition layout — the same input rows get the
same salt under any repartitioning, so salted plans are reproducible
run-to-run (``monotonically_increasing_id`` salts, by contrast, shift
with the physical partitioning even though results stay set-equal).
Trade-off: byte-identical duplicate rows co-bucket on one salt; a hot
key made of *identical* rows still needs a content column that varies
(or AQE's runtime split) to spread.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(
    df: DataFrame, n_salts: int, salt_cols: Sequence[str] | None = None
) -> Column:
    """Content-derived salt in [0, n_salts): stable under repartitioning.

    Hashes ``salt_cols`` when given, else every hashable column —
    Spark's ``hash`` rejects MapType (maps have no canonical order), so
    map columns are excluded rather than failing the whole salted plan.
    """
    if salt_cols is None:
        from pyspark.sql.types import MapType

        salt_cols = [f.name for f in df.schema.fields if not isinstance(f.dataType, MapType)]
        if not salt_cols:
            raise ValueError(
                "no hashable columns to salt on (all columns are map-typed); "
                "pass salt_cols with a derived key, e.g. map_keys(...)"
            )
    return F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).cast("int")

# aggregate name -> (phase-1 partial, phase-2 combine)
_REAGG = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, Column | str, str]],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys+salt) → groupBy(keys).

    ``aggs`` is ``[(out_name, column, fn)]`` with ``fn`` in
    {sum, count, min, max} — the re-aggregatable family (phase 2
    combines partials: count→sum, min→min, ...). A hot key's rows
    spread over ``n_salts`` reducers in phase 1; phase 2 touches only
    ``|groups| × n_salts`` rows. Equivalent to a plain groupBy for
    every re-aggregatable fn (decimal inputs keep sums exact — the
    engine's determinism rule).
    """
    for _, _, fn in aggs:
        if fn not in _REAGG:
            raise ValueError(f"{fn!r} is not re-aggregatable; use plain groupBy")
    salted = df.withColumn(SALT_COL, _row_salt(df, n_salts, salt_cols))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[
            _REAGG[fn][0](F.col(c) if isinstance(c, str) else c).alias(name)
            for name, c, fn in aggs
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_REAGG[fn][1](name).alias(name) for name, _, fn in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi join: scatter the big side, replicate the small.

    The big side gets a uniform salt; the small side is exploded
    ``n_salts``× so every (key, salt) bucket finds its match. Payload
    cost: ``|small| × n_salts`` extra rows — only worth it when one
    key dominates the big side (otherwise let AQE's skew split do the
    work). Result equals ``big.join(small, on, how)`` for inner/left
    ONLY: any right/full flavor would emit each unmatched small-side
    row once per salt replica — rejected up front.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "replicated small-side rows have no unique (key, salt) match, "
            "so right/full flavors duplicate unmatched small rows"
        )
    big_salted = big.withColumn(SALT_COL, _row_salt(big, n_salts, salt_cols))
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_salted.join(small_rep, [on, SALT_COL], how)
    return joined.drop(SALT_COL)
