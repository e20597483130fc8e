"""OCR block-DAG operators — A5/A6/J2 (SURVEY §2.9).

The reference walks a Textract block graph: DFS from each PAGE block
through CHILD/VALUE relationships to close the reachable-id set
(extract_async_helper.py:25-46), then keeps LINE blocks and joins their
text (:48-58). Its ``extract_page_text`` iterates a Python *set* —
line order is nondeterministic **[B]**; we implement the intended
semantics (document order via an explicit ``line_no``).

Spark-first restatement: blocks are a DataFrame
``(doc_id, block_id, block_type, text, line_no, page_no, child_ids)``;
the closure is an iterative ``explode(child_ids)`` self-join (J2's
hash-lookup as a real hash join) run to the DAG height — Textract
graphs are ≤3 deep (PAGE→LINE→WORD, KEY→VALUE), so the loop is a
fixed 3-step unrolled plan, not a driver-side loop over rows. The
DuckDB oracle recomputes the closure independently with a recursive
CTE over the same synthesized graph.

Scale: each closure step shuffles on block_id (the join key); block
rows are tiny. The practical production shortcut (SURVEY §2.9 A5):
Textract blocks carry a Page attribute, so the closure degenerates to
``groupBy(doc_id, page_no)`` — kept here in its general DAG form
because that is the operator the reference actually implements.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.checkpointing import materialize

CLOSURE_DEPTH = 3  # Textract DAG height: PAGE -> LINE/KEY -> WORD/VALUE


def synthesize_blocks(docs: DataFrame) -> DataFrame:
    """Deterministic Textract-shaped block graph from ``documents``.

    Per doc: P = doc_id%2+1 pages; per page L = doc_id%3+2 LINE blocks
    (2 WORD children each) plus one KEY→VALUE pair; the PAGE block's
    child_ids hold the line ids and the KEY id, the KEY's child_ids
    hold the VALUE id (the reference traverses every relationship type,
    extract_async_helper.py:36-45, so one edge array suffices).
    """
    # SQL-text form (was ~430 py4j round trips of Column algebra across
    # the five block frames — guide §5; plan unchanged, see
    # plans/r17/q34_blocks_page_text_*.txt)
    _d, _p, _l, _w = (
        "cast(doc_id as string)",
        "cast(p as string)",
        "cast(l as string)",
        "cast(w as string)",
    )
    pages = docs.selectExpr(
        "doc_id", "explode(sequence(1, cast(doc_id % 2 + 1 as int))) AS p"
    )
    n_lines = "cast(doc_id % 3 + 2 as int)"
    lines = pages.selectExpr(
        "doc_id", "p", f"explode(sequence(1, {n_lines})) AS l"
    )
    page_blocks = pages.selectExpr(
        "doc_id",
        f"concat_ws('-', 'pg', {_d}, {_p}) AS block_id",
        "'PAGE' AS block_type",
        "cast(null as string) AS text",
        "cast(null as int) AS line_no",
        "cast(p as int) AS page_no",
        f"concat(transform(sequence(1, {n_lines}),"
        f" l -> concat_ws('-', 'ln', {_d}, {_p}, cast(l as string))),"
        f" array(concat_ws('-', 'kvk', {_d}, {_p}))) AS child_ids",
    )
    line_blocks = lines.selectExpr(
        "doc_id",
        f"concat_ws('-', 'ln', {_d}, {_p}, {_l}) AS block_id",
        "'LINE' AS block_type",
        f"concat('linea ', {_l}, ' pagina ', {_p}, ' doc ', {_d}) AS text",
        "cast(l as int) AS line_no",
        "cast(p as int) AS page_no",
        "transform(sequence(1, 2),"
        f" w -> concat_ws('-', 'wd', {_d}, {_p}, {_l}, cast(w as string))) AS child_ids",
    )
    words = lines.selectExpr(
        "doc_id", "p", "l", "explode(sequence(1, 2)) AS w"
    )
    word_blocks = words.selectExpr(
        "doc_id",
        f"concat_ws('-', 'wd', {_d}, {_p}, {_l}, {_w}) AS block_id",
        "'WORD' AS block_type",
        f"concat('w', {_l}, {_w}) AS text",
        "cast(null as int) AS line_no",
        "cast(p as int) AS page_no",
        "cast(array() as array<string>) AS child_ids",
    )
    kv_keys = pages.selectExpr(
        "doc_id",
        f"concat_ws('-', 'kvk', {_d}, {_p}) AS block_id",
        "'KEY_VALUE_SET' AS block_type",
        "cast(null as string) AS text",
        "cast(null as int) AS line_no",
        "cast(p as int) AS page_no",
        f"array(concat_ws('-', 'kvv', {_d}, {_p})) AS child_ids",
    )
    kv_vals = pages.selectExpr(
        "doc_id",
        f"concat_ws('-', 'kvv', {_d}, {_p}) AS block_id",
        "'KEY_VALUE_SET' AS block_type",
        "cast(null as string) AS text",
        "cast(null as int) AS line_no",
        "cast(p as int) AS page_no",
        "cast(array() as array<string>) AS child_ids",
    )
    return reduce(
        lambda a, b: a.unionByName(b),
        [page_blocks, line_blocks, word_blocks, kv_keys, kv_vals],
    )


def page_closure(
    blocks: DataFrame, depth: int = CLOSURE_DEPTH, dedup: bool = True
) -> DataFrame:
    """A5 — reachable block ids per PAGE root via iterated edge joins.

    Returns ``(doc_id, page_no, bid)`` distinct rows: every block id
    reachable from each PAGE block. ``depth`` bounds the unrolled joins
    (DAG height, not data size); each step is a hash join on block_id.
    ``dedup=False`` skips the closing ``distinct`` — sound exactly when
    the block graph is a TREE (every block one parent), which Textract
    output is: depth-d frontiers are then disjoint, so the union is
    already duplicate-free and the closure saves a full shuffle.
    """
    edges = blocks.select(
        F.col("block_id").alias("src"), F.explode("child_ids").alias("dst")
    )
    roots = blocks.filter(F.col("block_type") == "PAGE").select(
        "doc_id", "page_no", F.col("block_id").alias("bid")
    )
    frontier = (
        roots.join(edges, roots.bid == edges.src)
        .select("doc_id", "page_no", F.col("dst").alias("bid"))
    )
    reach = frontier
    for _ in range(depth - 1):
        frontier = (
            frontier.join(edges, frontier.bid == edges.src)
            .select("doc_id", "page_no", F.col("dst").alias("bid"))
        )
        reach = reach.unionByName(frontier)
    return reach.distinct() if dedup else reach


def blocks_page_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + A6 — block-DAG page closure → ordered LINE-text pages.

    Closure ids joined back to the block table, LINE-filtered, then an
    ordered ``collect_list(struct(line_no, text))`` concat with "\\n"
    and a lines count (extract_async_helper.py:48-58, with the
    intended deterministic line order).
    """
    docs = table(spark, sf_dir, "documents")
    # materialize the synthesized graph once: the closure references
    # the block frame {depth}+2 times (edges per step, roots, the LINE
    # join-back), and each reference would otherwise re-run the whole
    # explode/concat synthesis. Block rows are tiny (ids + short text).
    # In production blocks arrive as a real table, so this checkpoint
    # models the scan; with a persisted source table it is a no-op.
    blocks = materialize(synthesize_blocks(docs))
    reach = page_closure(blocks, dedup=False)
    line_blocks = blocks.filter(F.col("block_type") == "LINE").select(
        F.col("block_id"), F.col("line_no"), F.col("text")
    )
    hit = reach.join(line_blocks, reach.bid == line_blocks.block_id)
    return hit.groupBy("doc_id", "page_no").agg(
        F.expr("count(1) AS lines_count"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(line_no, text))),"
            " s -> s.text), '\\n') AS page_text"
        ),
    )


BLOCKS_PAGE_TEXT_SQL = """
WITH pages AS (
  SELECT doc_id, CAST(p AS INTEGER) AS p
  FROM documents, unnest(generate_series(1, doc_id % 2 + 1)) AS tp(p)
),
lines AS (
  SELECT doc_id, p, CAST(l AS INTEGER) AS l
  FROM pages, unnest(generate_series(1, doc_id % 3 + 2)) AS tl(l)
),
edges AS (
  -- PAGE -> LINE
  SELECT 'pg-' || doc_id || '-' || p AS src, 'ln-' || doc_id || '-' || p || '-' || l AS dst
  FROM lines
  UNION ALL
  -- PAGE -> KEY
  SELECT 'pg-' || doc_id || '-' || p, 'kvk-' || doc_id || '-' || p FROM pages
  UNION ALL
  -- LINE -> WORD
  SELECT 'ln-' || doc_id || '-' || p || '-' || l,
         'wd-' || doc_id || '-' || p || '-' || l || '-' || w
  FROM lines, unnest(generate_series(1, 2)) AS tw(w)
  UNION ALL
  -- KEY -> VALUE
  SELECT 'kvk-' || doc_id || '-' || p, 'kvv-' || doc_id || '-' || p FROM pages
),
line_blocks AS (
  SELECT 'ln-' || doc_id || '-' || p || '-' || l AS block_id,
         l AS line_no,
         'linea ' || l || ' pagina ' || p || ' doc ' || doc_id AS text
  FROM lines
),
reach AS (
  -- recursive closure from each PAGE root (the oracle's independent
  -- recomputation of the iterated-join closure)
  WITH RECURSIVE r(doc_id, page_no, bid) AS (
    SELECT p.doc_id, p.p AS page_no, e.dst
    FROM pages p JOIN edges e ON e.src = 'pg-' || p.doc_id || '-' || p.p
    UNION
    SELECT r.doc_id, r.page_no, e.dst FROM r JOIN edges e ON e.src = r.bid
  )
  SELECT DISTINCT doc_id, page_no, bid FROM r
)
SELECT r.doc_id, r.page_no,
       COUNT(*) AS lines_count,
       string_agg(lb.text, chr(10) ORDER BY lb.line_no) AS page_text
FROM reach r
JOIN line_blocks lb ON lb.block_id = r.bid
GROUP BY r.doc_id, r.page_no
"""
