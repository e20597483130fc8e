"""End-to-end document-ETL plan — the orchestrator restated (SURVEY §3).

The reference wires two levels of LangGraph state machines: an
orchestrator that routes by document type
(workflow_orchestator.py:166-188) and a per-type
Extract→Transform→Load→Final pipeline (workflow_base.py:44-55). Here
the whole thing is ONE declarative composition over a requests
DataFrame:

1. **route (A1)** — three filtered branches: REGISTRATION →
   inscripciones, APPRAISAL → tasaciones, everything else → pólizas
   (the reference's default fall-through, workflow_orchestator.py:61-71).
2. **extract (S4/W1)** — decode the document payload; the truncated
   first-pages concat goes to ``document_content_total`` and the FULL
   text to ``document_content_llm`` — the reference's observed
   (swapped-looking) behavior **[B]**, reproduced deliberately
   (textract_extractor_document.py:58-68).
3. **transform (A2-A4 + C1-C3)** — the LLM port per domain via
   Arrow-batched ``mapInPandas``; period month/year refined.
4. **load (K1/K2 + F8)** — per-row text artifacts, stringified
   metadata map merged into the lake table; content columns dropped
   before the metadata sink.
5. **final (A11/F10/C9/K3)** — success conjunction gates the
   notification projection; nested JSON bodies go to the chunk-by-10
   writer.

Every stage is the operator already exercised by the oracle-checked
queries — this module only composes them, exactly like the reference's
graph wires its nodes. Scale: routing is three filters over one scan
(no shuffle); the per-domain branches reunite with ``unionByName``;
the only shuffles are the metadata merge key and the text-artifact
write partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.checkpointing import materialize
from sbs_suptech_etl_v2_spark.functions.scalars import refine_month, refine_year
from sbs_suptech_etl_v2_spark.operators.documents import (
    FIRST_PAGES,
    NOTIFICATION_TYPE,
    PAGE_WORDS,
)
from sbs_suptech_etl_v2_spark.operators.extraction import extract_structured
from sbs_suptech_etl_v2_spark.sinks.writers import (
    NotificationBatchWriter,
    merge_metadata,
    write_text_artifacts,
)

POLIZAS_OUT = (
    "record_id string, policy_number string, policy_name string, "
    "policy_start_date string, policy_end_date string"
)
TASACIONES_OUT = (
    "record_id string, expert_warranty_name string, tasacion_date string, "
    "commercial_value string, realization_value string, tasacion_owner string"
)
INSCRIPCIONES_OUT = (
    "record_id string, inscription_number string, legal_name string, "
    "inscription_date string"
)

_FLOWS = (
    ("inscripciones", "llm_caller_inscripciones", INSCRIPCIONES_OUT),
    ("tasaciones", "llm_caller_tasaciones", TASACIONES_OUT),
    ("polizas", "llm_caller_polizas", POLIZAS_OUT),
)


def _route(requests: DataFrame) -> dict[str, DataFrame]:
    """A1 — type-routed branches with the reference's default fall-through."""
    return {
        "inscripciones": requests.filter(F.col("document_type") == "REGISTRATION"),
        "tasaciones": requests.filter(F.col("document_type") == "APPRAISAL"),
        "polizas": requests.filter(
            ~F.col("document_type").isin("REGISTRATION", "APPRAISAL")
        ),
    }


def _extract(branch: DataFrame) -> DataFrame:
    """S4/W1 — decoded content, first-pages vs full split, success flag."""
    text = F.decode(F.col("content"), "utf-8")
    words = F.split(text, " ")
    n_pages = F.ceil(F.size(words) / F.lit(PAGE_WORDS)).cast("int")
    first_pages = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.least(n_pages, F.lit(FIRST_PAGES))),
            lambda i: F.array_join(
                F.slice(words, (i - 1) * PAGE_WORDS + 1, PAGE_WORDS), " "
            ),
        ),
        "\n\n",
    )
    return branch.select(
        "record_id",
        "parent_id",
        "session_id",
        "document_type",
        "period_month",
        "period_year",
        # [B] reproduced: truncated text -> _total, full text -> _llm
        first_pages.alias("document_content_total"),
        text.alias("document_content_llm"),
        (F.length(text) > 0).alias("extract_success"),
    )


def _transform(
    extracted: DataFrame, port_method: str, out_schema: str, port_factory=None
) -> DataFrame:
    """A2-A4 + C2/C3 — port extraction (F4-gated) + period refinement."""
    gated = extracted.filter(F.col("extract_success"))
    fields = extract_structured(
        gated.select("record_id", F.col("document_content_llm").alias("content")),
        port_method,
        out_schema,
        key_cols=("record_id",),
        port_factory=port_factory,
    )
    return (
        gated.join(fields, "record_id", "left")
        .withColumn("period_month", refine_month(F.col("period_month")))
        .withColumn("period_year", refine_year(F.col("period_year")))
        .withColumn("transform_success", F.lit(True))
    )


def _metadata_map(transformed: DataFrame, extracted_cols: list[str]) -> DataFrame:
    """C10 — stringified open metadata map for the K2 merge."""
    entries: list = []
    for c in ["document_type", "period_month", "period_year", *extracted_cols]:
        entries.append(F.lit(c))
        entries.append(F.col(c).cast("string"))
    return transformed.select(
        "record_id",
        F.map_filter(
            F.create_map(*entries), lambda _, v: v.isNotNull()
        ).alias("metadata"),
    )


def run_document_etl(
    spark: SparkSession,
    requests: DataFrame,
    lake_dir: str,
    notifier: NotificationBatchWriter | None = None,
    port_factory=None,
) -> DataFrame:
    """Run the full Extract→Transform→Load→Notify plan.

    ``requests`` must carry the DocumentContractState columns plus a
    binary ``content`` payload (from the listing scan or the stream
    decoder). Side effects: ``{lake_dir}/txt/*.txt`` artifacts and the
    ``{lake_dir}/metadata`` merged table. Returns the per-document
    result rows (record_id, document_type, success) after notifying.

    The transform output is ``persist()``ed before the first action:
    the plan fires three actions per flow (K1 text write, K2 metadata
    merge, results/notify), and without the persist each one would
    re-execute the ``mapInPandas`` LLM port — exactly the reference's
    double-execution bug **[B]** (workflow_orchestator.py:82-83) at 3×
    the external-call spend. The returned result frame is
    ``localCheckpoint``ed (it is small — one flag row per request) so
    the cached port output can be released before returning.
    """
    notifier = notifier if notifier is not None else NotificationBatchWriter()
    branches = _route(requests)
    results = []
    persisted: list[DataFrame] = []
    for flow, port_method, out_schema in _FLOWS:
        extracted = _extract(branches[flow])
        transformed = _transform(extracted, port_method, out_schema, port_factory)
        # one port execution per flow: cache across the K1/K2/notify actions
        transformed = transformed.persist()
        persisted.append(transformed)
        extracted_cols = [
            f.split(" ")[0] for f in out_schema.split(", ") if not f.startswith("record_id")
        ]
        # K1 — text artifacts from the executors, then F8 content drop
        write_text_artifacts(
            transformed.select(
                "record_id", F.col("document_content_total").alias("content")
            ),
            lake_dir,
        )
        loaded = (
            transformed.drop("document_content_total", "document_content_llm")
            .withColumn("load_success", F.lit(True))
        )
        # K2 — merge the stringified metadata into the lake table
        merge_metadata(
            spark, f"{lake_dir}/metadata", _metadata_map(loaded, extracted_cols)
        )
        # F4-gated stages drop failed rows from the load path; the result
        # set keeps EVERY request with its conjunction verdict (A11) —
        # rows that never reached transform/load report success=False
        flags = loaded.select("record_id", "transform_success", "load_success")
        results.append(
            extracted.select(
                "record_id", "parent_id", "session_id", "extract_success"
            )
            .join(flags, "record_id", "left")
            .select(
                "record_id",
                "parent_id",
                "session_id",
                F.lit(flow).alias("flow"),
                (
                    F.col("extract_success")
                    & F.coalesce(F.col("transform_success"), F.lit(False))
                    & F.coalesce(F.col("load_success"), F.lit(False))
                ).alias("success"),
            )
        )
    merged = results[0]
    for other in results[1:]:
        merged = merged.unionByName(other)
    ok = merged.filter(F.col("success"))
    notifications = ok.select(
        F.col("record_id").alias("recordId"),
        F.to_json(
            F.struct(
                F.col("session_id").alias("sessionId"),
                F.lit(NOTIFICATION_TYPE).alias("type"),
                F.struct(
                    F.col("record_id").alias("recordId"),
                    F.col("parent_id").alias("parentId"),
                ).alias("data"),
            )
        ).alias("body"),
    )
    notifier(notifications, batch_id=0)
    # cut the lineage of the (small) result frame so the port caches can
    # be released — callers may run further actions on the return value
    merged = materialize(merged, eager=True)
    for df in persisted:
        df.unpersist()
    return merged
