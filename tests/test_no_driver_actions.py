"""Source-scan pin: no driver-side data paths in the package.

The standing scale claim (SCALING.md "Global invariants") is that no
operator ever pulls data to the driver — the ONLY driver actions are
the dedup fixpoint's 1-row convergence probes (a distributed iterative
algorithm must observe convergence somewhere, and a 1-row aggregate
probe is the bounded way to do it). Until now that claim was re-audited
by hand each round; this test pins it: a `.collect(`/`.toPandas(`/
`.first(`/`.toLocalIterator(`/`.show(` appearing anywhere else in the
package fails the suite and names the file (the CLI's print sink — a
row ITERATOR, bounded by construction — is the one allow-listed
toLocalIterator). Streaming/sink modules go through foreachBatch and
executor-side writers, so they are covered by the same rule.

The scan tokenizes each file and drops COMMENT and STRING tokens
before matching, so a marker inside a comment or docstring doesn't
false-positive AND a '#' inside a string literal can't truncate a
line and hide a real call after it (naive `line.split('#')[0]`
stripping had exactly that false-negative hole).

Pure source scan — no SparkSession.
"""

from __future__ import annotations

import io
import pathlib
import tokenize

import sbs_suptech_etl_v2_spark as pkg

PKG_ROOT = pathlib.Path(pkg.__file__).parent

# every allowed driver-action site: file (relative to the package) ->
# exact allowed occurrence count. The three dedup sites are the
# fixpoint's convergence probes, all 1-row aggregates: the r18
# single-plan first probe (.first() of the fused pre/post-round sum
# pair), the pointer-doubling loop's fused union-aggregate .collect(),
# and the steady-state loop's per-round sum .first(); __main__.py's
# toLocalIterator IS the CLI's print sink — the one place whose whole
# job is to stream rows to the driver's stdout, and an iterator (one
# partition in flight, never the full frame) is the bounded way to do
# it; nothing else is
# allowed.
ALLOWED = {
    "operators/dedup.py": {".collect(": 1, ".first(": 2},
    "__main__.py": {".toLocalIterator(": 1},
}

# .take(/.head( are EXCLUDED: pandas/pyarrow methods of the same name
# run inside Arrow kernels (e.g. RecordBatch.take in similarity.py's
# pair scorer) — executor-side, not driver actions. The markers
# below have no in-kernel namesakes in this codebase. .show( and
# .toLocalIterator( joined in round 12 (ADVICE: the scan was weaker
# than its docstring claimed without them).
MARKERS = (".collect(", ".toPandas(", ".first(", ".toLocalIterator(", ".show(")

# FSTRING_* token kinds exist only on Python >= 3.12 (PEP 701);
# on older runtimes f-strings arrive as single STRING tokens
_CODE_IRRELEVANT = {
    tokenize.COMMENT,
    tokenize.STRING,
    tokenize.NL,
    tokenize.NEWLINE,
    tokenize.INDENT,
    tokenize.DEDENT,
} | {
    getattr(tokenize, k)
    for k in ("FSTRING_START", "FSTRING_MIDDLE", "FSTRING_END")
    if hasattr(tokenize, k)
}


def _code_text(path: pathlib.Path) -> str:
    """The file's code tokens joined with spaces, comments and string
    literals removed — `.collect(` survives as `. collect (`
    regardless of line breaks, but never from prose."""
    toks = tokenize.generate_tokens(io.StringIO(path.read_text()).readline)
    return " ".join(t.string for t in toks if t.type not in _CODE_IRRELEVANT)


def _scan() -> dict[str, dict[str, int]]:
    found: dict[str, dict[str, int]] = {}
    for path in sorted(PKG_ROOT.rglob("*.py")):
        rel = str(path.relative_to(PKG_ROOT))
        code = _code_text(path)
        for m in MARKERS:
            spaced = f". {m[1:-1]} ("
            n = code.count(spaced)
            if n:
                found.setdefault(rel, {})[m] = n
    return found


def test_only_allowed_driver_actions_in_package():
    found = _scan()
    assert found == ALLOWED, (
        "driver-action sites changed - if a new .collect()/.toPandas()/"
        f".first() is intentional and bounded (1-row probe), add it "
        f"to ALLOWED with a justification; found={found}"
    )


def test_scanner_is_not_fooled_by_hash_in_string(tmp_path):
    """Self-check for the false-negative hole the tokenizing scan
    closes: a real call after a '#'-bearing string literal must be
    seen, and a docstring mentioning the marker must not count."""
    f = tmp_path / "probe.py"
    f.write_text(
        '"""docstring mentions .collect( but is prose."""\n'
        "def go(df):\n"
        "    # comment mentions .collect( too\n"
        "    x = df.filter('#').collect()\n"
        "    return x\n"
    )
    code = _code_text(f)
    assert code.count(". collect (") == 1
