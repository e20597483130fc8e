"""r18 measurement harness (guide §1): per-query wall clock (noop
sink), Spark job/stage counts via job groups, and explain("formatted")
capture, on a warmed session — the same methodology as bench.py, for
targeted before/after iteration without paying the full suite.

Usage: python plans/r18/measure.py [--explain] [--rounds N] q75_neardup_fixpoint [q111_... ...]
Writes plans to plans/r18/<query>_<tag>.txt when --explain TAG is given.
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    args = sys.argv[1:]
    explain_tag = None
    rounds = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--explain":
            explain_tag = next(it)
        elif a == "--rounds":
            rounds = int(next(it))
        else:
            names.append(a)

    from sbs_suptech_etl_v2_spark.registry import QUERIES
    from sbs_suptech_etl_v2_spark.session import get_spark
    from bench import _warmup, _materialize, _settled_group_count, _group_stage_count

    spark = get_spark(app_name="measure-r18", master=f"local[{cpus}]")
    _warmup(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    if explain_tag:
        import contextlib
        import io

        here = os.path.dirname(os.path.abspath(__file__))
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            with open(os.path.join(here, f"{name}_{explain_tag}.txt"), "w") as fh:
                fh.write(txt)
            nex = sum(
                1 for line in txt.splitlines()
                if line.strip().startswith("(") and " Exchange" in line
            )
            print(f"wrote {name}_{explain_tag}.txt ({nex} Exchange nodes)")

    import gc

    samples = {n: [] for n in names}
    jobs = {n: [] for n in names}
    stages = {n: [] for n in names}
    for rnd in range(rounds):
        for name in names:
            group = f"measure:{name}:{rnd}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            _materialize(QUERIES[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            jobs[name].append(_settled_group_count(tracker, group))
            stages[name].append(_group_stage_count(tracker, group))
            gc.collect()
    for name in names:
        med = statistics.median(samples[name])
        print(
            f"{name:38s} med {med:6.3f}s  all {[round(s,3) for s in samples[name]]}"
            f"  jobs {jobs[name]}  stages {stages[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
