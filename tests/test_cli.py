"""CLI entry point: list / run / oracle against the registry."""

from __future__ import annotations

import json

import pytest

from sbs_suptech_etl_v2_spark.__main__ import main
from sbs_suptech_etl_v2_spark.registry import QUERIES


def test_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(QUERIES)
    assert any(line.startswith("q01_pricing_summary\toracle") for line in out)
    assert any(line.startswith("q43_notification_ids\trows-only") for line in out)


def test_run_emits_json_rows(capsys):
    # sf0.001 + shared-session CPUs keeps this a smoke, not a bench
    rc = main(
        ["run", "q11_positional_pick", "--sf-dir", "/root/testdata/sf0.001", "--cpus", "4"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines
    first = json.loads(lines[0])
    assert "o_orderkey" in first


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q01_pricing_summary"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()


def test_unknown_query_is_an_error(capsys):
    assert main(["run", "q999_nope", "--sf-dir", "/tmp"]) == 2


def test_rows_only_query_has_no_oracle(capsys):
    assert main(["oracle", "q43_notification_ids"]) == 1


def test_curate_emits_corpus_and_report(capsys):
    rc = main(
        ["curate", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(lines) <= 3
    row = json.loads(lines[0])
    assert {"doc_id", "text", "n_tokens"} <= set(row)

    rc = main(["curate", "--sf-dir", "/root/testdata/sf0.001", "--report"])
    assert rc == 0
    reasons = {
        json.loads(l)["reason"]
        for l in capsys.readouterr().out.strip().splitlines()
    }
    assert "kept" in reasons
