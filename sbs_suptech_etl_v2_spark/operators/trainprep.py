"""Training-data preparation operator family — [EXT] beyond SURVEY §2.

The corpus-level verbs an LLM training-data pipeline runs between raw
ingest and tokenization, each a declarative DataFrame plan over the
``documents`` table (reference parity: the reference has no corpus
surface at all — these extend the [EXT] mandate of SURVEY §2.11
alongside dedup/similarity/textops):

- **benchmark contamination check** (q61) — fraction of each training
  document's k-shingles that also occur in a held-out benchmark set
  (train/test decontamination). The benchmark shingle vocabulary is
  small and fixed (eval suites are ~1e4 docs regardless of corpus
  size), so it collapses to ONE broadcast row and the corpus side
  stays map-only — no shuffle at any scale.
- **repetition quality stats** (q62) — Gopher-style repetition gates:
  top-token fraction, duplicated-token fraction, top-bigram fraction.
  Pure per-row array math, shuffle-free.
- **lexicon scrub** (q63) — the PII-redaction operator shape:
  regex-match a term lexicon, count hits, emit redacted text. A real
  deployment swaps the lexicon regex for email/phone/SSN patterns —
  the plan (map-only ``regexp_count`` + ``regexp_replace``) is
  identical.
- **stratified hash sampling** (q64) — per-language deterministic
  Bernoulli sampling via a portable md5-derived bucket: rebalances a
  skewed language mix (downsample the dominant language) with zero
  shuffles and exact reproducibility under any partitioning.
- **sequence packing** (q65) — assign documents to ~fixed-token packs
  per (lang, shard) via a running-sum window: the deterministic
  contiguous-greedy approximation of training-batch packing. Sharding
  bounds window-partition width so the sort never concentrates a
  whole language on one task.

All ratios divide exact integers (IEEE-identical in both engines); all
hashes are the portable md5-derived 32-bit hash shared with the dedup
family (`dedup._hash32`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.checkpointing import materialize
from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.operators.dedup import (
    _ORACLE_SHINGLE_HASHES,
    _SQL_HASH32,
    _hash32,
    _shingle_sets,
    _words,
)

# -- q61 benchmark contamination ------------------------------------------
BENCH_MOD = 19  # doc_id % 19 == 0 plays the held-out benchmark set
CONTAMINATION_FLAG = 0.15  # flag docs sharing >= 15% of shingles

# -- q62 repetition gates (thresholds sit inside the corpus distribution
# so both keep outcomes occur — the gate is exercised, not vacuous)
MAX_TOP_TOKEN_FRAC = 0.11
MAX_DUP_TOKEN_FRAC = 0.85
MAX_TOP_BIGRAM_FRAC = 0.06

# -- q63 scrub lexicon (stands in for PII patterns; same operator shape)
SCRUB_LEXICON = ("customer", "supplier", "order", "line", "key")
_SCRUB_PATTERN = r"\b(" + "|".join(SCRUB_LEXICON) + r")\b"
_SCRUB_TOKEN = "[REDACTED]"

# -- q64 per-language sample rates (percent kept; downsample dominant en)
SAMPLE_RATES = {"de": 40, "en": 15, "es": 40, "fr": 40, "zh": 40}
_SAMPLE_SALT = "strat:"

# -- q65 packing
PACK_TOKENS = 512  # target tokens per pack
PACK_SHARDS = 4  # deterministic shards per language
_PACK_SALT = "pack:"


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] train/test decontamination — shingle overlap vs a benchmark.

    Benchmark docs (``doc_id % BENCH_MOD == 0``) contribute their
    distinct shingle vocabulary — a broadcast-sized frame at any corpus
    scale (eval suites are fixed-size). The evaluation side explodes
    its shingles, LEFT-joins the broadcast vocabulary as a hit marker,
    and folds straight back to one row per document in a single
    aggregation: ``n_shingles = count(*)``, ``n_contaminated =
    count(marker)``. Shuffle volume is the per-document partial-agg
    output (two counters per doc per map partition), never the shingle
    stream — and there is no join-back, so nothing corpus-sized is ever
    broadcast. Measured 2× faster than the per-row
    ``array_intersect``-against-broadcast-vocabulary form it replaced
    (each row paid a hash-set build over the full vocabulary).

    The shingle sets come from the vectorized NumPy kernel
    (``dedup._shingle_sets`` — the interpreted-HOF expression form was
    the q61 hot spot before that) and are materialized ONCE: the
    benchmark and evaluation branches would otherwise each recompute
    every md5. ``hashes`` is never empty (short docs get the whole-text
    fallback hash), so the explode drops no documents.
    """
    docs = table(spark, sf_dir, "documents")
    # LAZY cut (r18, VERDICT r17 #3): bench_keys is the hinted-
    # broadcast build side of the left join, so AQE completes its
    # stage — computing and persisting the shingle RDD — before the
    # evaluation branch's aggregate stage re-scans the cached blocks;
    # the stage dependency makes the lazy cut race-free and saves the
    # dedicated eager-checkpoint job (measured 5 -> 4 jobs).
    sh = materialize(_shingle_sets(docs.select("doc_id", "text")), eager=False)
    bench_keys = (
        sh.where(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("hashes").alias("h"))
        .distinct()
        .withColumn("marker", F.lit(1))
    )
    frac = F.col("n_contaminated") / F.col("n_shingles")
    return (
        sh.where(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id", F.explode("hashes").alias("h"))
        .join(F.broadcast(bench_keys), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("marker").alias("n_contaminated"),
        )
        .withColumn("contamination_frac", frac)
        .withColumn("flagged", frac >= CONTAMINATION_FLAG)
    )


CONTAMINATION_CHECK_SQL = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_ORACLE_SHINGLE_HASHES},
bench AS (
  SELECT list_distinct(flatten(list(hashes))) AS bench_hashes
  FROM shingle_hashed WHERE doc_id % {BENCH_MOD} = 0
)
SELECT doc_id, n_shingles, n_contaminated,
       CAST(n_contaminated AS DOUBLE) / n_shingles AS contamination_frac,
       CAST(n_contaminated AS DOUBLE) / n_shingles >= {CONTAMINATION_FLAG}
         AS flagged
FROM (
  SELECT s.doc_id,
         CAST(len(s.hashes) AS BIGINT) AS n_shingles,
         CAST(len(list_intersect(s.hashes, b.bench_hashes)) AS BIGINT)
           AS n_contaminated
  FROM shingle_hashed s, bench b
  WHERE s.doc_id % {BENCH_MOD} <> 0
)
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Gopher-style repetition quality gate.

    Per document: top-token fraction, duplicated-token fraction
    (tokens belonging to types occurring >= 2x), top-bigram fraction -
    then a conjunctive keep flag. Counting is pure Column arithmetic:
    exact integer counts inside whole-stage codegen, deterministic
    under any partitioning and any library version. An earlier NumPy
    ``mapInPandas`` kernel computed the same integers but leaned on
    pandas/numpy internals (``factorize``/``reduceat``) that a
    different sandbox can version-skew (round-6 driver RED while
    bit-exact locally); and a first Column version ran tokens and
    bigrams as separate groupBy branches, re-scanning and re-shuffling
    the corpus once per branch. The per-row O(types x tokens)
    HOF-counting form stays rejected (the q22/q51 interpreted-HOF
    lesson). Round 10 removed the remaining HOFs too: the tagged gram
    stream is now built AFTER a ``posexplode_outer`` — bigrams come
    from a codegen'd window ``lead(tok)`` over the already-satisfied
    hash(doc_id) partitioning (a partition-local sort on the unique
    (doc_id, pos), no new exchange) and ``stack`` emits the
    (kind, gram) pairs — where the array-building
    ``transform``/``zip_with``/``slice`` chain evaluated on Catalyst's
    interpreted CodegenFallback path per row (measured interleaved
    median-of-5 at sf0.1: 1.11 s -> 0.90 s, exact output parity at
    sf0.01 and sf0.1).

    NULL text propagates NULL counters and fractions (never a
    divide-by-zero under ANSI mode); a single-token document has zero
    bigrams and defines ``top_bigram_frac`` as 0.0.
    """
    docs = table(spark, sf_dir, "documents")
    # ONE scan, ONE doc-keyed exchange, ZERO joins: tokens and
    # adjacent-pair bigrams ride a single tagged gram stream
    # (kind 1 = token, kind 2 = bigram), hash(doc_id) satisfies
    # ClusteredDistribution for the window, the (doc_id, kind, gram)
    # count, and the per-doc rollup (subset-of-keys rule, q96/q105
    # pattern), and the rollup derives every counter by conditional
    # aggregation — so nothing corpus-sized shuffles twice and no
    # doc-grain join re-broadcasts what one aggregate can carry.
    # posexplode_outer keeps NULL-text documents as a pos-NULL row, so
    # their counters stay NULL without a join-back.
    # SQL-text form (guide §5; plan unchanged —
    # plans/r17/q62_repetition_stats_*.txt)
    base = docs.selectExpr("doc_id", "split(text, ' ') AS ws").repartition(
        "doc_id"
    )
    exploded = (
        base.selectExpr(
            "doc_id",
            "cast(size(ws) as bigint) AS n_toks",
            "posexplode_outer(ws) AS (pos, tok)",
        )
        .withColumn(
            "nxt",
            F.expr("lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)"),
        )
        .select(
            "doc_id",
            "n_toks",
            "pos",
            F.expr("stack(2, 1, tok, 2, concat(tok, ' ', nxt))").alias(
                "kind", "gram"
            ),
        )
        # a pos-NULL row is the outer-explode placeholder (NULL/empty
        # ws): its kind must stay NULL exactly like the explode_outer
        # of an empty gram array used to produce, so the rollup's
        # conditional aggregates see no token row for it
        .withColumn("kind", F.expr("CASE WHEN pos IS NOT NULL THEN kind END"))
        # the last token's bigram seat has no successor: drop it
        # (n-1 bigrams per n-token doc); keep placeholder rows
        .where("pos IS NULL OR NOT (kind = 2 AND gram IS NULL)")
        .select("doc_id", "n_toks", "kind", "gram")
    )
    counts = exploded.groupBy("doc_id", "kind", "gram").agg(
        F.expr("max(n_toks) AS n_toks"), F.expr("count(1) AS c")
    )
    out = counts.groupBy("doc_id").agg(
        F.expr("max(n_toks) AS n_tokens"),
        F.expr("cast(max(CASE WHEN kind = 1 THEN c END) as bigint) AS top_token_n"),
        F.expr(
            "cast(CASE WHEN max(n_toks) IS NOT NULL THEN"
            " coalesce(sum(CASE WHEN kind = 1 AND c >= 2 THEN c END), 0)"
            " END as bigint) AS dup_token_n"
        ),
        F.expr(
            "cast(CASE WHEN max(n_toks) >= 2 THEN"
            " coalesce(max(CASE WHEN NOT (kind = 1) THEN c END), 0)"
            " WHEN max(n_toks) IS NOT NULL THEN 0"
            " END as bigint) AS top_bigram_n"
        ),
    )
    ttf = F.expr("CASE WHEN n_tokens >= 1 THEN top_token_n / n_tokens END")
    dtf = F.expr("CASE WHEN n_tokens >= 1 THEN dup_token_n / n_tokens END")
    # single-token docs have zero bigrams: define the fraction as 0.0
    # rather than divide by zero (ANSI mode raises on n_tokens == 1)
    tbf = F.expr(
        "CASE WHEN n_tokens >= 2 THEN top_bigram_n / (n_tokens - 1)"
        " WHEN n_tokens IS NOT NULL THEN 0.0D END"
    )
    return (
        out.withColumn("top_token_frac", ttf)
        .withColumn("dup_token_frac", dtf)
        .withColumn("top_bigram_frac", tbf)
        .withColumn(
            "keep",
            (ttf <= MAX_TOP_TOKEN_FRAC)
            & (dtf <= MAX_DUP_TOKEN_FRAC)
            & (tbf <= MAX_TOP_BIGRAM_FRAC),
        )
    )


# Oracle restricted to constructs the driver sandbox has already proven
# green elsewhere (unnest + GROUP BY as in q26/q108, lateral
# generate_series as in q16/q19/q44, plain list indexing) - the round-6
# list_transform/list_filter lambda form hash-diverged there while
# matching locally (engine-version skew).
REPETITION_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents
),
tokc AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(ws) AS tok FROM base)
  GROUP BY doc_id, tok
),
uni AS (
  SELECT doc_id,
         CAST(MAX(c) AS BIGINT) AS top_token_n,
         CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END), 0) AS BIGINT)
           AS dup_token_n
  FROM tokc GROUP BY doc_id
),
bgc AS (
  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
    FROM base, unnest(generate_series(1, CAST(len(ws) AS BIGINT) - 1)) AS t(i)
  )
  GROUP BY doc_id, bg
),
bgm AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS bg_top FROM bgc GROUP BY doc_id
),
s AS (
  SELECT b.doc_id,
         CAST(len(b.ws) AS BIGINT) AS n_tokens,
         u.top_token_n,
         u.dup_token_n,
         CAST(CASE WHEN len(b.ws) >= 2 THEN COALESCE(m.bg_top, 0)
                   WHEN b.ws IS NULL THEN NULL
                   ELSE 0 END AS BIGINT) AS top_bigram_n
  FROM base b
  LEFT JOIN uni u ON u.doc_id = b.doc_id
  LEFT JOIN bgm m ON m.doc_id = b.doc_id
)
SELECT doc_id, n_tokens, top_token_n, dup_token_n, top_bigram_n,
       CAST(top_token_n AS DOUBLE) / n_tokens AS top_token_frac,
       CAST(dup_token_n AS DOUBLE) / n_tokens AS dup_token_frac,
       CASE WHEN n_tokens >= 2
            THEN CAST(top_bigram_n AS DOUBLE) / (n_tokens - 1)
            WHEN n_tokens IS NULL THEN NULL
            ELSE 0.0 END AS top_bigram_frac,
       CAST(top_token_n AS DOUBLE) / n_tokens <= {MAX_TOP_TOKEN_FRAC}
         AND CAST(dup_token_n AS DOUBLE) / n_tokens <= {MAX_DUP_TOKEN_FRAC}
         AND CASE WHEN n_tokens >= 2
                  THEN CAST(top_bigram_n AS DOUBLE) / (n_tokens - 1)
                  WHEN n_tokens IS NULL THEN NULL
                  ELSE 0.0 END <= {MAX_TOP_BIGRAM_FRAC}
         AS keep
FROM s
"""


def lexicon_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] PII-scrub operator shape: lexicon regex -> count + redact.

    Map-only ``regexp_count`` / ``regexp_replace`` over the text
    column; the output carries the hit count and an md5 of the redacted
    text (narrow row — the scrubbed text itself would be written to the
    cleaned-corpus sink, not shuffled around). Swap ``_SCRUB_PATTERN``
    for email/phone/ID patterns in production; \\b word boundaries
    behave identically in Java regex and RE2 for ASCII text.
    """
    docs = table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.col("text"), _SCRUB_PATTERN, _SCRUB_TOKEN)
    n_hits = F.regexp_count(F.col("text"), F.lit(_SCRUB_PATTERN)).cast("bigint")
    return docs.select(
        "doc_id",
        n_hits.alias("n_hits"),
        F.md5(redacted).alias("redacted_md5"),
    ).withColumn("has_hits", F.col("n_hits") > 0)


LEXICON_SCRUB_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) AS BIGINT) AS n_hits,
       md5(regexp_replace(text, '{_SCRUB_PATTERN}', '{_SCRUB_TOKEN}', 'g')) AS redacted_md5,
       len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) > 0 AS has_hits
FROM documents
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic per-language Bernoulli sampling.

    ``bucket = md5-hash(salt || doc_id) % 100``; a row survives when
    its bucket falls under its language's keep-rate. Pure row-local
    filter: reproducible under any partitioning or cluster size (no
    RNG, no ``TABLESAMPLE`` — those are partition-layout-dependent),
    pushdown-friendly, zero shuffles. This is how a 100 TB pipeline
    rebalances a language mix without materializing intermediate
    corpora.
    """
    docs = table(spark, sf_dir, "documents")
    rate = F.element_at(
        F.create_map(*[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]),
        F.col("lang"),
    )
    bucket = (
        _hash32(F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string"))) % 100
    )
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
) + " END"

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, bucket
FROM (
  SELECT doc_id, lang,
         {_SQL_HASH32.format(x="'" + _SAMPLE_SALT + "' || CAST(doc_id AS VARCHAR)")}
           % 100 AS bucket
  FROM documents
)
WHERE bucket < {_RATE_CASE}
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] contiguous-greedy sequence packing into ~PACK_TOKENS packs.

    Documents are sharded deterministically (md5 bucket) within each
    language, ordered by doc_id, and cut into packs where the running
    token total crosses the pack size: ``pack_id = (cumsum - tokens)
    div PACK_TOKENS``. One window shuffle on (lang, shard) — the shard
    key bounds partition width, so no single language concentrates on
    one task at scale (tune PACK_SHARDS ~ cluster parallelism). The
    pack summary reuses the same (lang, shard) grouping, so AQE plans
    the groupBy on the window's existing partitioning.
    """
    docs = table(spark, sf_dir, "documents")
    tokens = F.size(_words(F.col("text"))).cast("bigint")
    shard = (
        _hash32(F.concat(F.lit(_PACK_SALT), F.col("doc_id").cast("string")))
        % PACK_SHARDS
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = docs.select(
        "doc_id", "lang", shard.alias("shard"), tokens.alias("tokens")
    ).withColumn("cum_tokens", F.sum("tokens").over(w))
    packed = staged.withColumn(
        "pack_id", F.floor((F.col("cum_tokens") - F.col("tokens")) / PACK_TOKENS)
    )
    return packed.groupBy("lang", "shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SEQUENCE_PACKING_SQL = f"""
WITH staged AS (
  SELECT doc_id, lang,
         {_SQL_HASH32.format(x="'" + _PACK_SALT + "' || CAST(doc_id AS VARCHAR)")}
           % {PACK_SHARDS} AS shard,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, shard, tokens,
         SUM(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM staged
)
SELECT lang, shard,
       -- explicit FLOOR over float division instead of the `//`
       -- operator: integer-division operator semantics moved across
       -- DuckDB versions (round-6 driver RED while green locally);
       -- cum_tokens stays < 2^40 at any real corpus shard, far inside
       -- the double-exact range, so FLOOR is exact on both engines
       CAST(FLOOR(CAST(cum_tokens - tokens AS DOUBLE) / {PACK_TOKENS})
            AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       -- CAST: DuckDB SUM(BIGINT) returns HUGEINT, which the pandas
       -- fetch path renders as float64 ("2048.0" vs Spark's int64
       -- "2048") — the r06/r07 driver hash-RED signature.  This was
       -- one of exactly two uncast HUGEINT outputs in the registry.
       CAST(SUM(tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY lang, shard,
         CAST(FLOOR(CAST(cum_tokens - tokens AS DOUBLE) / {PACK_TOKENS})
              AS BIGINT)
"""


# -- q80 typed PII redaction ----------------------------------------------
# The corpus is synthetic and PII-free, so both engines INJECT the same
# deterministic entities per row before scrubbing — the operator under
# test is the typed multi-pattern redactor, not the generator.
_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"555-[0-9]{4}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] typed PII redaction — per-class counts + cleaned checksum.

    The production scrub pass over a web corpus: one regex per entity
    class (email, phone here; SSN/IBAN/address patterns drop in the
    same way), per-class hit counts for the cleaning report, class
    tokens substituted in place, and a checksum of the cleaned text
    (the cleaned corpus itself would stream to the output sink — only
    narrow audit rows flow on). Map-only: no shuffle at any scale.
    Patterns stay in the ASCII subset where Java regex (Spark) and RE2
    (DuckDB) agree.
    """
    docs = table(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_pii = docs.select("doc_id", enriched.alias("pii_text"))
    n_emails = F.size(F.regexp_extract_all("pii_text", F.lit(_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all("pii_text", F.lit(_PHONE_RE), F.lit(0)))
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("pii_text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return with_pii.select(
        "doc_id",
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
        F.md5(cleaned).alias("clean_md5"),
        (~cleaned.rlike(_EMAIL_RE) & ~cleaned.rlike(_PHONE_RE)).alias("is_clean"),
    )


PII_REDACTION_SQL = f"""
WITH with_pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
  FROM documents
),
cleaned AS (
  SELECT doc_id, pii_text,
         regexp_replace(regexp_replace(pii_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
  FROM with_pii
)
SELECT doc_id,
       CAST(len(regexp_extract_all(pii_text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(pii_text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(clean_text) AS clean_md5,
       NOT regexp_matches(clean_text, '{_EMAIL_RE}')
         AND NOT regexp_matches(clean_text, '{_PHONE_RE}') AS is_clean
FROM cleaned
"""


# -- q81 source-mixture accounting ----------------------------------------
# Per-language keep weights (percent) for corpus rebalancing: upsample
# nothing, keep most English, thin the rest — the mixture a pretraining
# run would request. Deterministic md5-bucket Bernoulli per row.
MIX_WEIGHTS = {"en": 90, "de": 60, "fr": 50, "es": 40, "zh": 25}
_MIX_SALT = "mix:"


def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] mixture-weighting accounting — the per-(lang, source)
    ledger of a corpus rebalance.

    Applies the deterministic per-language Bernoulli keep (same
    row-local md5-bucket device as q64 — reproducible under any
    partitioning) and aggregates the BEFORE/AFTER ledger per
    (lang, source): document and character budgets in, kept counts
    out. This is the table a data-mixing run reports to decide whether
    realized rates track requested weights. ONE shuffle (the
    (lang, source) regroup with map-side partial aggregation); the
    filter itself never shuffles.
    """
    docs = table(spark, sf_dir, "documents")
    # Unknown languages carry weight 0 (drop), not NULL: a NULL weight
    # would make `kept` NULL and SUM over the all-NULL column NULL,
    # diverging from the oracle's CASE ... ELSE 0 contract.
    weight = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in MIX_WEIGHTS.items() for x in kv]),
            F.col("lang"),
        ),
        F.lit(0),
    )
    bucket = (
        _hash32(F.concat(F.lit(_MIX_SALT), F.col("doc_id").cast("string"))) % 100
    )
    kept = bucket < weight
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_in"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("chars_kept"),
        )
        .withColumn("realized_rate", F.col("n_kept") / F.col("n_docs").cast("double"))
    )


_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_WEIGHTS.items())
) + " ELSE 0 END"

SOURCE_MIXTURE_SQL = f"""
WITH flagged AS (
  SELECT lang, source, n_chars,
         {_SQL_HASH32.format(x="'" + _MIX_SALT + "' || CAST(doc_id AS VARCHAR)")}
           % 100 < {_MIX_CASE} AS kept
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_in,
       CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS realized_rate
FROM flagged
GROUP BY lang, source
"""


# -- q97 weighted reservoir sample ----------------------------------------
SAMPLE_K = 10  # docs kept per language


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-Res, Efraimidis &
    Spirakis 2006) — the length-weighted cousin of q64's Bernoulli
    sampler: pick the top {SAMPLE_K} documents per language with
    inclusion probability proportional to document length.

    A-Res draws u ~ Uniform(0,1) per item and keeps the k largest
    u^(1/w); ranking by ln(u)/w is monotone-equivalent and avoids the
    pow. The uniform is the portable md5-derived 32-bit hash (shared
    with q64), so the sample is deterministic, partition-independent,
    and reproducible on both engines — a re-run of the pipeline (or a
    backfill on different hardware) selects byte-identical training
    subsets. One row_number window per language; no shuffle beyond the
    lang partition, no float in the OUTPUT (the ln key stays internal;
    a rank flip would need two keys within one double ulp).
    """
    docs = table(spark, sf_dir, "documents")
    u = (_hash32(F.col("doc_id").cast("string")) + 1) / F.lit(4294967297.0)
    key = F.log(u) / F.col("n_chars")
    w = W.partitionBy("lang").orderBy(F.desc("sample_key"), "doc_id")
    return (
        # weight-0 exclusion (A-Res semantics): a zero-length document
        # has inclusion probability 0 and would otherwise divide ln(u)
        # by zero — -inf ordering differs between the engines
        docs.filter(F.col("n_chars") > 0)
        .select("lang", "doc_id", "n_chars", key.alias("sample_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("lang", "doc_id", "n_chars", "rk")
    )


_SQL_U = f"({_SQL_HASH32.format(x='CAST(doc_id AS VARCHAR)')} + 1) / 4294967297.0"

WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars, ln({_SQL_U}) / n_chars AS sample_key
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY sample_key DESC, doc_id) AS rk
  FROM keyed
)
SELECT lang, doc_id, n_chars, rk FROM ranked WHERE rk <= {SAMPLE_K}
"""


# -- q101 retrieval chunking ------------------------------------------------
CHUNK_TOKENS = 16  # window width (tokens)
CHUNK_STRIDE = 12  # window stride (tokens) — 4-token overlap


def rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the retrieval/packing
    primitive that turns documents into fixed-width, stride-overlapped
    token windows (RAG index build, long-context training shards).

    Contract: chunks start at token offsets 0, {CHUNK_STRIDE},
    2·{CHUNK_STRIDE}, … while the offset is inside the document; each
    chunk takes {CHUNK_TOKENS} tokens (the tail chunk may be shorter).
    The plan is one ``sequence``-explode per row — map-side only, no
    shuffle at any corpus size, and the emitted chunk carries a
    portable content hash so a downstream chunk-dedup (q79) or ANN
    index build can key on it without re-reading the text.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _words(F.col("text")).alias("ws"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("ws") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
        "ws",
    ).select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.array_join(
            F.slice(F.col("ws"), F.col("start") + 1, CHUNK_TOKENS), " "
        ).alias("chunk_text"),
        F.least(F.size("ws") - F.col("start"), F.lit(CHUNK_TOKENS))
        .cast("bigint")
        .alias("chunk_tokens"),
    )
    return chunks.withColumn("chunk_hash", _hash32(F.col("chunk_text")))


RAG_CHUNKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents
)
SELECT doc_id,
       CAST(g.start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       g.start,
       array_to_string(ws[g.start + 1 : g.start + {CHUNK_TOKENS}], ' ')
         AS chunk_text,
       CAST(least(len(ws) - g.start, {CHUNK_TOKENS}) AS BIGINT)
         AS chunk_tokens,
       {_SQL_HASH32.format(x=f"array_to_string(ws[g.start + 1 : g.start + {CHUNK_TOKENS}], ' ')")}
         AS chunk_hash
FROM toks, unnest(range(0, len(ws), {CHUNK_STRIDE})) AS g(start)
"""
