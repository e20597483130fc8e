"""Golden end-to-end test of the composed document-ETL plan.

Twelve requests across the three domains run the full
Extract→Transform→Load→Notify composition against deterministic
fixture contents; assertions cover routing, the [B] content split,
extracted fields in the merged metadata, per-row artifacts, and
chunked notifications (SURVEY §5 golden-output strategy).
"""

from __future__ import annotations

import json

from sbs_suptech_etl_v2_spark.plans.document_etl import run_document_etl
from sbs_suptech_etl_v2_spark.sinks.writers import NotificationBatchWriter


def _polizas_text(i: int) -> str:
    return (
        f"POLIZA DE SEGURO POL-{i} | Asegurado: CLIENTE {i} | "
        f"Vigencia desde el 01/03/2021 hasta el 01/03/2022"
    )


def _tasaciones_text(i: int) -> str:
    return (
        f"INFORME DE TASACION | Perito: ING {i} | Fecha de tasacion: 05/02/2019 | "
        f"Valor comercial: S/ 250000 | Valor de realizacion: S/ 225000 | "
        f"Propietario: SOC {i}"
    )


def _inscripciones_text(i: int) -> str:
    return (
        f"Partida N {1000 + i} presentado el 06/12/2021 a favor de BANCO {i}"
    )


def _requests(spark):
    rows = []
    for i in range(12):
        dtype = ["POLICY", "REGISTRATION", "APPRAISAL", "DEFAULT"][i % 4]
        text = {
            "POLICY": _polizas_text,
            "DEFAULT": _polizas_text,  # fall-through to pólizas
            "REGISTRATION": _inscripciones_text,
            "APPRAISAL": _tasaciones_text,
        }[dtype](i)
        rows.append(
            (
                f"rec_{i}",
                f"par_{i % 3}",
                f"Polizas/Mayo 2023/doc_{i}.pdf",
                f"s{i % 2}",
                dtype,
                "Mayo",
                "2023",
                text.encode("utf-8"),
            )
        )
    return spark.createDataFrame(
        rows,
        "record_id string, parent_id string, key string, session_id string, "
        "document_type string, period_month string, period_year string, "
        "content binary",
    )


def test_full_document_etl_plan(spark, tmp_path):
    lake = str(tmp_path / "lake")
    notifier = NotificationBatchWriter()
    results = run_document_etl(spark, _requests(spark), lake, notifier)
    rows = {r["record_id"]: r for r in results.collect()}

    # routing: REGISTRATION -> inscripciones, APPRAISAL -> tasaciones,
    # POLICY and DEFAULT both fall through to pólizas
    assert rows["rec_0"]["flow"] == "polizas"
    assert rows["rec_3"]["flow"] == "polizas"  # DEFAULT fall-through
    assert rows["rec_1"]["flow"] == "inscripciones"
    assert rows["rec_2"]["flow"] == "tasaciones"
    assert len(rows) == 12 and all(r["success"] for r in rows.values())

    # K1 artifacts: one txt per document
    txt = tmp_path / "lake" / "txt"
    assert sorted(p.name for p in txt.iterdir()) == sorted(
        f"rec_{i}.txt" for i in range(12)
    )
    assert "POLIZA DE SEGURO POL-0" in (txt / "rec_0.txt").read_text()

    # K2 metadata: extracted fields + refined periods, all strings
    meta = {
        r["record_id"]: dict(r["metadata"])
        for r in spark.read.parquet(f"{lake}/metadata").collect()
    }
    assert meta["rec_0"]["policy_number"] == "POL-0"
    assert meta["rec_0"]["policy_name"] == "CLIENTE 0"
    assert meta["rec_0"]["period_month"] == "5"  # C2: Mayo -> "5"
    assert meta["rec_0"]["period_year"] == "2023"
    assert meta["rec_2"]["commercial_value"] == "250000"
    assert meta["rec_1"]["inscription_number"] == "1001"
    assert meta["rec_1"]["inscription_date"] == "06/12/2021"

    # K3 notifications: 12 successes, every chunk ≤10 (per-partition
    # chunking — executors send independently), nested JSON body
    sent = [e for b in notifier.sent_batches for e in b]
    assert len(sent) == 12
    assert all(len(b) <= 10 for b in notifier.sent_batches)
    assert sorted(e["Id"] for e in sent) == sorted(f"rec_{i}" for i in range(12))
    body = json.loads(notifier.sent_batches[0][0]["MessageBody"])
    assert body["type"].startswith("regulatory-compliance")
    assert set(body["data"]) == {"recordId", "parentId"}


def test_port_executes_once_per_request(spark, tmp_path):
    """The LLM port must run exactly once per request across the whole
    composed plan (K1 write + K2 merge + notify + caller actions).

    Guards against the reference's double-execution bug [B]
    (workflow_orchestator.py:82-83): before the persist() fix the three
    actions re-ran the mapInPandas port ~3x per flow. Each port call
    drops a uniquely-named marker file from the executor; the total
    must equal the request count.
    """
    import os
    import uuid as uuid_mod

    calls_dir = str(tmp_path / "calls")
    os.makedirs(calls_dir)

    def factory():
        from sbs_suptech_etl_v2_spark.ports.transformer import FakeTransformer

        class CountingTransformer(FakeTransformer):
            def _mark(self):
                path = os.path.join(calls_dir, uuid_mod.uuid4().hex)
                with open(path, "w") as fh:
                    fh.write("1")

            def llm_caller_polizas(self, content):
                self._mark()
                return super().llm_caller_polizas(content)

            def llm_caller_inscripciones(self, content):
                self._mark()
                return super().llm_caller_inscripciones(content)

            def llm_caller_tasaciones(self, content):
                self._mark()
                return super().llm_caller_tasaciones(content)

        return CountingTransformer()

    results = run_document_etl(
        spark,
        _requests(spark),
        str(tmp_path / "lake"),
        NotificationBatchWriter(),
        port_factory=factory,
    )
    # two extra caller-side actions on the returned frame: still no re-run
    assert results.count() == 12
    assert len(results.collect()) == 12
    assert len(os.listdir(calls_dir)) == 12  # exactly one port call per request


def test_failed_extract_produces_no_notification(spark, tmp_path):
    empty_content = spark.createDataFrame(
        [("rec_x", "p", "k", "s", "POLICY", "Mayo", "2023", b"")],
        "record_id string, parent_id string, key string, session_id string, "
        "document_type string, period_month string, period_year string, "
        "content binary",
    )
    notifier = NotificationBatchWriter()
    results = run_document_etl(spark, empty_content, str(tmp_path / "lake"), notifier)
    rows = results.collect()
    assert len(rows) == 1 and rows[0]["success"] is False
    assert notifier.sent_batches == []  # A11 gate held
