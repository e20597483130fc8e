"""Source-scan pin: no driver-side data paths in the package.

The standing scale claim (SCALING.md "Global invariants") is that no
operator ever pulls data to the driver — the ONLY driver actions are
the dedup fixpoint's 1-row convergence probes (a distributed iterative
algorithm must observe convergence somewhere, and a 1-row aggregate
probe is the bounded way to do it). Until now that claim was re-audited
by hand each round; this test pins it: a `.collect(`/`.toPandas(`/
`.first(` appearing anywhere else in the package fails the suite and
names the site. Streaming/sink modules go through foreachBatch and
executor-side writers, so they are covered by the same rule. The scan
strips comments and excludes pandas/pyarrow namesakes (see MARKERS).

Pure source scan — no SparkSession.
"""

from __future__ import annotations

import pathlib

import sbs_suptech_etl_v2_spark as pkg

PKG_ROOT = pathlib.Path(pkg.__file__).parent

# every allowed driver-action site: file (relative to the package) ->
# exact allowed occurrence count. The three dedup sites are the
# fixpoint's convergence probes (two fused 1-row union-aggregate
# collects + one 1-row .first()); nothing else is allowed.
ALLOWED = {
    "operators/dedup.py": {".collect(": 2, ".first(": 1},
}

# .take(/.head( are EXCLUDED: pandas/pyarrow methods of the same name
# run inside Arrow kernels (e.g. RecordBatch.take in similarity.py's
# pair scorer) — executor-side, not driver actions. The three markers
# below have no in-kernel namesakes in this codebase.
MARKERS = (".collect(", ".toPandas(", ".first(")


def _scan() -> dict[str, dict[str, int]]:
    found: dict[str, dict[str, int]] = {}
    for path in sorted(PKG_ROOT.rglob("*.py")):
        rel = str(path.relative_to(PKG_ROOT))
        for ln, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]  # ignore comments
            for m in MARKERS:
                if m in code:
                    found.setdefault(rel, {}).setdefault(m, 0)
                    found[rel][m] += 1
    return found


def test_only_allowed_driver_actions_in_package():
    found = _scan()
    assert found == ALLOWED, (
        "driver-action sites changed - if a new .collect()/.toPandas()/"
        f".first() is intentional and bounded (1-row probe), add it "
        f"to ALLOWED with a justification; found={found}"
    )
