"""Document-pipeline operator family (SURVEY §2.3, §2.8, §2.9).

The reference's per-document imperative pipeline, re-expressed as
set-oriented DataFrame plans over the driver's ``documents``/``customer``
/``orders`` tables so each op is oracle-checkable:

- path decomposition + listing filters (F1/F2/F7 —
  s3_poller_document.py:14-55)
- scalar refinements (C1/C2/C3 — workflow_service.py:8-44)
- page fan-out + ordered first-N concat (A6/A7/W1/G3/G4 —
  extract_async_helper.py:48-58, textract_extractor_document.py:45-70)
- metadata stringify + merge-upsert, exploded for checking
  (C10/C11/K2 — dynamo_loader_document.py:33-58)
- stage gates → success conjunction → notification projection
  (F4/A11/F10 — workflow_polizas.py:55-115, workflow_orchestator.py:147-163)

Inputs that the reference gets from its environment (S3 keys, month
folders, metadata maps) are derived deterministically from table
columns so Spark and the DuckDB oracle compute them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.functions.scalars import (
    format_text_key,
    map_merge_new_wins,
    refine_dates,
    refine_month,
    refine_year,
    stringify_map_values,
)
from sbs_suptech_etl_v2_spark.io import table

# Spanish month literals used to synthesize folder names (mixed case to
# exercise C2's lower(trim(...)) normalization).
_MONTHS_MIXED = [
    "Enero",
    "FEBRERO",
    " marzo ",
    "Abril",
    "mayo",
    "JUNIO",
    "Julio",
    "agosto",
    "Septiembre",
    "OCTUBRE",
    "noviembre",
    "Diciembre",
]


def _month_case(expr: str) -> str:
    """SQL CASE mapping doc_id%12 → mixed-case Spanish month literal."""
    whens = "\n".join(
        f"    WHEN {i} THEN '{m}'" for i, m in enumerate(_MONTHS_MIXED)
    )
    return f"CASE {expr}\n{whens}\n  END"


def _month_col(expr: F.Column) -> F.Column:
    c = F.when(expr == 0, _MONTHS_MIXED[0])
    for i, m in enumerate(_MONTHS_MIXED[1:], start=1):
        c = c.when(expr == i, m)
    return c


def scalar_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2/C3 — regex date pick, Spanish-month map, year validation.

    Inputs are synthesized per doc_id: a free-text sentence that may or
    may not embed a dd/mm/yyyy date, a month string (valid Spanish /
    garbage / NULL), and a year string (valid / padded / split / alpha /
    NULL). All refinements are pure Column expressions — no UDFs.
    """
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    date_text = F.when(
        did % 3 != 0,
        F.format_string(
            "Emitido el %02d/%02d/%04d en Lima",
            (did % 28 + 1).cast("int"),
            (did % 12 + 1).cast("int"),
            (did % 30 + 2000).cast("int"),
        ),
    ).otherwise(F.lit("sin fecha registrada"))
    month_raw = F.when(did % 14 == 12, F.lit("Birmingham")).when(
        did % 14 != 13, _month_col(did % 14)
    )  # %14==13 → NULL
    year_raw = (
        F.when(did % 5 == 0, F.lit("2023"))
        .when(did % 5 == 1, F.lit(" 2024 "))
        .when(did % 5 == 2, F.lit("20 23"))
        .when(did % 5 == 3, F.lit("abc"))
    )  # %5==4 → NULL
    return docs.select(
        "doc_id",
        refine_dates(date_text).alias("refined_date"),
        refine_month(month_raw).alias("refined_month"),
        refine_year(year_raw).alias("refined_year"),
    )


SCALAR_REFINEMENT_SQL = f"""
WITH raw AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 <> 0
         THEN printf('Emitido el %02d/%02d/%04d en Lima',
                     CAST(doc_id % 28 + 1 AS INT),
                     CAST(doc_id % 12 + 1 AS INT),
                     CAST(doc_id % 30 + 2000 AS INT))
         ELSE 'sin fecha registrada' END AS date_text,
    CASE WHEN doc_id % 14 = 12 THEN 'Birmingham'
         WHEN doc_id % 14 <> 13 THEN {_month_case("doc_id % 14")}
         END AS month_raw,
    CASE doc_id % 5 WHEN 0 THEN '2023' WHEN 1 THEN ' 2024 '
                    WHEN 2 THEN '20 23' WHEN 3 THEN 'abc' END AS year_raw
  FROM documents
)
SELECT doc_id,
  NULLIF(regexp_extract(date_text, '\\b(\\d{{2}}/\\d{{2}}/\\d{{4}})\\b', 1), '') AS refined_date,
  CASE lower(trim(month_raw))
    WHEN 'enero' THEN '1' WHEN 'febrero' THEN '2' WHEN 'marzo' THEN '3'
    WHEN 'abril' THEN '4' WHEN 'mayo' THEN '5' WHEN 'junio' THEN '6'
    WHEN 'julio' THEN '7' WHEN 'agosto' THEN '8' WHEN 'septiembre' THEN '9'
    WHEN 'octubre' THEN '10' WHEN 'noviembre' THEN '11' WHEN 'diciembre' THEN '12'
    END AS refined_month,
  CASE WHEN regexp_full_match(trim(year_raw), '[0-9]{{4}}')
       THEN trim(year_raw) END AS refined_year
FROM raw
"""


def path_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F7 — S3-listing filters + path decomposition.

    Synthesizes listing keys (valid pdf, uppercase .PDF, directory key,
    wrong extension, unparseable folder), applies the reference's
    listing filters (skip dirs, keep *.pdf case-insensitively), then
    splits ``Prefix/{Mes YYYY}/name.ext`` into refined period columns.
    Null-safe: unparseable folders yield NULL month/year
    (s3_poller_document.py:29-41).
    """
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    month = F.trim(_month_col(did % 12))
    year = (did % 6 + 2020).cast("string")
    folder = F.concat(month, F.lit(" "), year)
    key = (
        F.when(
            did % 5 == 0,
            F.concat(F.lit("Polizas/"), folder, F.lit("/doc_"), did, F.lit(".pdf")),
        )
        .when(
            did % 5 == 1,
            F.concat(F.lit("Inscripciones/"), folder, F.lit("/doc_"), did, F.lit(".PDF")),
        )
        .when(did % 5 == 2, F.concat(F.lit("Tasaciones/"), folder, F.lit("/")))
        .when(
            did % 5 == 3,
            F.concat(F.lit("Polizas/"), folder, F.lit("/doc_"), did, F.lit(".docx")),
        )
        .otherwise(F.concat(F.lit("Polizas/badfolder/doc_"), did, F.lit(".pdf")))
    )
    listed = docs.select("doc_id", key.alias("key"))
    kept = listed.filter(
        (~F.col("key").endswith("/")) & F.lower(F.col("key")).endswith(".pdf")
    )
    parts = F.split(F.col("key"), "/")
    folder_col = F.get(parts, 1)
    folder_parts = F.split(folder_col, " ")
    month_tok = F.when(F.size(folder_parts) == 2, F.get(folder_parts, 0))
    year_tok = F.when(F.size(folder_parts) == 2, F.get(folder_parts, 1))
    return kept.select(
        "doc_id",
        "key",
        F.get(parts, 0).alias("prefix"),
        F.get(parts, F.size(parts) - 1).alias("basename"),
        refine_month(month_tok).alias("period_month"),
        refine_year(year_tok).alias("period_year"),
    )


PATH_PARSE_SQL = f"""
WITH listing AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'Polizas/' || folder || '/doc_' || doc_id || '.pdf'
      WHEN 1 THEN 'Inscripciones/' || folder || '/doc_' || doc_id || '.PDF'
      WHEN 2 THEN 'Tasaciones/' || folder || '/'
      WHEN 3 THEN 'Polizas/' || folder || '/doc_' || doc_id || '.docx'
      ELSE 'Polizas/badfolder/doc_' || doc_id || '.pdf' END AS key
  FROM (
    SELECT doc_id,
           trim({_month_case("doc_id % 12")}) || ' ' ||
           CAST(doc_id % 6 + 2020 AS VARCHAR) AS folder
    FROM documents
  )
),
kept AS (
  SELECT * FROM listing
  WHERE NOT ends_with(key, '/') AND ends_with(lower(key), '.pdf')
),
parsed AS (
  SELECT doc_id, key,
    str_split(key, '/')[1] AS prefix,
    str_split(key, '/')[len(str_split(key, '/'))] AS basename,
    CASE WHEN len(str_split(str_split(key, '/')[2], ' ')) = 2
         THEN str_split(str_split(key, '/')[2], ' ')[1] END AS month_tok,
    CASE WHEN len(str_split(str_split(key, '/')[2], ' ')) = 2
         THEN str_split(str_split(key, '/')[2], ' ')[2] END AS year_tok
  FROM kept
)
SELECT doc_id, key, prefix, basename,
  CASE lower(trim(month_tok))
    WHEN 'enero' THEN '1' WHEN 'febrero' THEN '2' WHEN 'marzo' THEN '3'
    WHEN 'abril' THEN '4' WHEN 'mayo' THEN '5' WHEN 'junio' THEN '6'
    WHEN 'julio' THEN '7' WHEN 'agosto' THEN '8' WHEN 'septiembre' THEN '9'
    WHEN 'octubre' THEN '10' WHEN 'noviembre' THEN '11' WHEN 'diciembre' THEN '12'
    END AS period_month,
  CASE WHEN regexp_full_match(trim(year_tok), '[0-9]{{4}}')
       THEN trim(year_tok) END AS period_year
FROM parsed
"""

PAGE_WORDS = 10  # words per simulated page
FIRST_PAGES = 2  # W1 analog cap (reference caps at 20 real pages)


def pages_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W1/G3/G4 — per-page text + first-N concat, shuffle-free.

    Documents are paginated into 10-word chunks (the reference's
    Textract pages) and re-aggregated: page count, word count, and the
    first-2-pages ordered concat with "\\n\\n" (the reference's
    first-20-pages cap, textract_extractor_document.py:58-60).

    Every output is derivable per-row from ``text``, so the plan is
    pure array expressions — ``split`` once, then
    ``sequence``/``transform``/``slice``/``array_join`` — zero explode,
    zero shuffle. At 100 TB of text this is a narrow map-only stage;
    the word-level explode + double groupBy alternative (kept as
    q19_pages_explode for explicit G2 coverage) shuffles every word.
    """
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_pages = F.ceil(F.size(words) / F.lit(PAGE_WORDS)).cast("int")
    page_text = lambda i: F.array_join(  # noqa: E731
        F.slice(words, (i - 1) * PAGE_WORDS + 1, PAGE_WORDS), " "
    )
    return docs.select(
        "doc_id",
        n_pages.alias("n_pages"),
        F.size(words).cast("bigint").alias("n_words"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.least(n_pages, F.lit(FIRST_PAGES))),
                page_text,
            ),
            "\n\n",
        ).alias("first_pages"),
    )


PAGES_CONCAT_SQL = f"""
WITH arr AS (
  SELECT doc_id, str_split(text, ' ') AS words FROM documents
)
SELECT doc_id,
       CAST(ceil(len(words)/{PAGE_WORDS}.0) AS INTEGER) AS n_pages,
       CAST(len(words) AS BIGINT) AS n_words,
       array_to_string(
         list_transform(
           range(1, least(CAST(ceil(len(words)/{PAGE_WORDS}.0) AS BIGINT), {FIRST_PAGES}) + 1),
           p -> array_to_string(list_slice(words, (p-1)*{PAGE_WORDS}+1, p*{PAGE_WORDS}), ' ')),
         chr(10) || chr(10)) AS first_pages
FROM arr
"""


def pages_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8/G2/G4 — explicit page fan-out + ordered list re-aggregation.

    The distributed explode pattern the reference performs per Textract
    page (one row per page, then per-document re-aggregation with
    page-order preserved): posexplode word positions → page rows →
    ``sort_array(collect_list(struct(page_no, ...)))`` concat —
    q16_pages_concat is the shuffle-free production form; this query
    exists to exercise G2 (list-concat accumulation) and A7/A8
    (fan-out + re-parenting) as real physical operators. Ref:
    extract_async_helper.py:48-58, workflow_orchestator.py:79-93.

    ONE shuffle, placed before the fan-out: repartitioning by doc_id
    ahead of the explode moves each document's raw text over the wire
    exactly once, and hashpartitioning(doc_id) satisfies the clustering
    requirement of BOTH downstream aggregates ((doc_id, page_no) is a
    superset of the partition key), so the page agg and the document
    rollup run exchange-free where the naive plan shuffles exploded
    per-word structs twice — the difference between ~1× and ~3× text
    bytes on the wire at 100 TB.
    """
    # no spread() here: the hash repartition below collapses any
    # round-robin redistribution anyway (CollapseRepartition), so the
    # spread would contribute only its planning-probe latency
    docs = table(spark, sf_dir, "documents").repartition("doc_id")
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )
    pages = (
        words.withColumn("page_no", (F.col("pos") / PAGE_WORDS).cast("int") + 1)
        .groupBy("doc_id", "page_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.word,
                ),
                " ",
            ).alias("page_text"),
            F.count(F.lit(1)).alias("page_words"),
        )
    )
    return pages.groupBy("doc_id").agg(
        F.max("page_no").cast("int").alias("n_pages"),
        F.sum("page_words").cast("bigint").alias("n_words"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("page_no", "page_text"))),
                    lambda s: s.page_no <= FIRST_PAGES,
                ),
                lambda s: s.page_text,
            ),
            "\n\n",
        ).alias("first_pages"),
    )


PAGES_EXPLODE_SQL = f"""
WITH arr AS (
  SELECT doc_id, str_split(text, ' ') AS words FROM documents
),
pages AS (
  SELECT doc_id, t.page_no,
         array_to_string(
           list_slice(words, (t.page_no-1)*{PAGE_WORDS}+1, t.page_no*{PAGE_WORDS}),
           ' ') AS page_text,
         len(list_slice(words, (t.page_no-1)*{PAGE_WORDS}+1, t.page_no*{PAGE_WORDS})) AS page_words
  FROM arr,
       unnest(generate_series(1, CAST(ceil(len(words)/{PAGE_WORDS}.0) AS BIGINT))) AS t(page_no)
)
SELECT doc_id,
       CAST(MAX(page_no) AS INTEGER) AS n_pages,
       CAST(SUM(page_words) AS BIGINT) AS n_words,
       string_agg(CASE WHEN page_no <= {FIRST_PAGES} THEN page_text END, chr(10) || chr(10)
                  ORDER BY page_no) AS first_pages
FROM pages
GROUP BY doc_id
"""


def metadata_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10/C11/K2 — stringify-all + dict.update-style map merge, exploded.

    Existing metadata (3 keys/customer) merged with an update batch
    (2 keys for 2/3 of customers — new wins on ``acctbal``); result is
    exploded to (custkey, meta_key, meta_value) rows so the oracle can
    hash plain strings instead of maps. The oracle computes the same
    merge relationally (new rows + old rows anti-joined on key).
    """
    customer = table(spark, sf_dir, "customer")
    # values pre-cast to string (C10's str(value)) — create_map would
    # otherwise coerce mixed value types to a common non-string type
    old_map = stringify_map_values(
        F.create_map(
            F.lit("document_type"), F.col("c_mktsegment"),
            F.lit("acctbal"), F.col("c_acctbal").cast("string"),
            F.lit("legacy"), F.concat(F.lit("old_"), F.col("c_custkey")),
        )
    )
    new_map = F.when(
        F.col("c_custkey") % 3 != 0,
        stringify_map_values(
            F.create_map(
                F.lit("acctbal"), F.round(F.col("c_acctbal") * 2, 2).cast("string"),
                F.lit("status"), F.when(F.col("c_acctbal") > 0, "active").otherwise("frozen"),
            )
        ),
    )
    merged = customer.select(
        F.col("c_custkey").alias("custkey"),
        map_merge_new_wins(old_map, new_map).alias("meta"),
    )
    return merged.select(
        "custkey", F.explode(F.col("meta")).alias("meta_key", "meta_value")
    )


METADATA_MERGE_SQL = """
WITH old AS (
  SELECT c_custkey AS custkey, 'document_type' AS meta_key, c_mktsegment AS meta_value FROM customer
  UNION ALL
  SELECT c_custkey, 'acctbal', CAST(c_acctbal AS VARCHAR) FROM customer
  UNION ALL
  SELECT c_custkey, 'legacy', 'old_' || c_custkey FROM customer
),
new AS (
  SELECT c_custkey AS custkey, 'acctbal' AS meta_key,
         CAST(round(c_acctbal * 2, 2) AS VARCHAR) AS meta_value
  FROM customer WHERE c_custkey % 3 <> 0
  UNION ALL
  SELECT c_custkey, 'status', CASE WHEN c_acctbal > 0 THEN 'active' ELSE 'frozen' END
  FROM customer WHERE c_custkey % 3 <> 0
)
SELECT custkey, meta_key, meta_value FROM new
UNION ALL
SELECT o.custkey, o.meta_key, o.meta_value
FROM old o ANTI JOIN new n ON o.custkey = n.custkey AND o.meta_key = n.meta_key
"""


NOTIFICATION_TYPE = "regulatory-compliance-prompts.insert-metadata"


def stage_gate_notifications(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/A11/F10 — stage-success conjunction → notification projection.

    Stage flags are derived deterministically per order (the reference
    sets them per pipeline stage); only rows where extract & transform &
    load all succeed produce a notification row with the constant type
    string (workflow_orchestator.py:147-163). uuid() is intentionally
    NOT in the checked output (nondeterministic — C7).
    """
    orders = table(spark, sf_dir, "orders")
    flagged = orders.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") > 5000).alias("extract_success"),
        (F.col("o_orderkey") % 7 != 0).alias("transform_success"),
        (F.col("o_orderkey") % 11 != 0).alias("load_success"),
    )
    ok = flagged.filter(
        F.col("extract_success") & F.col("transform_success") & F.col("load_success")
    )
    return ok.select(
        F.col("o_orderkey").cast("string").alias("recordId"),
        F.concat(F.lit("parent_"), F.col("o_custkey")).alias("parentId"),
        F.concat(F.lit("session_"), (F.col("o_custkey") % 10)).alias("sessionId"),
        F.lit(NOTIFICATION_TYPE).alias("type"),
    )


STAGE_GATE_NOTIFICATIONS_SQL = f"""
SELECT CAST(o_orderkey AS VARCHAR) AS "recordId",
       'parent_' || o_custkey AS "parentId",
       'session_' || (o_custkey % 10) AS "sessionId",
       '{NOTIFICATION_TYPE}' AS "type"
FROM orders
WHERE o_totalprice > 5000 AND o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
"""


def artifact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C6 + F6/F8 — S3 text-artifact projection before the load stage.

    The pólizas load step formats ``txt/{record_id}.txt``, UTF-8-encodes
    the content for S3, then nulls the big text columns so only slim
    metadata reaches DynamoDB (workflow_polizas.py:85-92). Here: the
    key format (C5), the ``encode`` to BinaryType with its exact byte
    length and sha-256 digest (C6 — checked via the digest, not raw
    bytes), and an explicit ``drop`` of the content columns (F6/F8) so
    the output projection carries no text — Catalyst prunes the
    dropped columns out of the scan entirely.
    """
    docs = table(spark, sf_dir, "documents")
    record_id = F.concat(F.lit("rec_"), F.col("doc_id").cast("string"))
    body = F.encode(F.col("text"), "utf-8")
    staged = docs.select(
        record_id.alias("record_id"),
        format_text_key(record_id).alias("s3_key"),
        F.length(body).cast("bigint").alias("body_bytes"),
        F.sha2(body, 256).alias("body_sha256"),
        F.col("text"),
        F.col("lang"),
    )
    # F6/F8 — anti-projection: content dropped before the metadata sink
    return staged.drop("text", "lang")


ARTIFACT_KEYS_SQL = """
SELECT 'rec_' || doc_id AS record_id,
       'txt/rec_' || doc_id || '.txt' AS s3_key,
       octet_length(encode(text)) AS body_bytes,
       sha256(text) AS body_sha256
FROM documents
"""
