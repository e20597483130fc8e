"""Extractor-document port — S4 (SURVEY §2.1).

The reference's extractor is async Textract OCR: start a document
analysis job on S3 PDF bytes, poll every 5 s until it finishes,
paginate the block list via NextToken, then flatten to blocks
(textract_extractor_document.py:28-124). The port boundary
(extractor_document_port.py:6-10) takes one document and yields its
block rows — a table-producing (UDTF-shaped) port.

Spark-first: the port runs inside ``mapInPandas`` over a binary
document column; one input row fans out to N block rows. This module
provides:

- ``FakeExtractor`` — deterministic OCR: decodes the payload bytes and
  segments them into PAGE/LINE blocks ({LINE_WORDS} words per line,
  {PAGE_LINES} lines per page) with the Textract block fields the
  downstream closure/aggregation operators consume (A5/A6).
- ``ProductionExtractor`` — the Textract shape: ``start → poll(5 s) →
  paginate`` around injected client callables, with the A10 retry
  policy on every remote call; fails fast without an injected client.
- ``extract_blocks`` — the mapInPandas wrapper turning a
  ``(doc_id, content: binary)`` DataFrame into a blocks DataFrame.

Scale: one Arrow batch of documents per task; the fan-out happens
executor-side (1 doc → pages×lines rows) so no driver involvement, and
the binary payload never survives past the port (blocks carry text
only — the F8 drop-big-columns pattern).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame

from sbs_suptech_etl_v2_spark.ports.transformer import with_throttling_retry

if TYPE_CHECKING:
    import pandas as pd

LINE_WORDS = 5
PAGE_LINES = 4
POLL_INTERVAL_S = 5.0  # textract_extractor_document.py:113-115

BLOCKS_SCHEMA = (
    "doc_id bigint, page_no int, line_no int, block_type string, text string"
)


class FakeExtractor:
    """Deterministic OCR: utf-8 payload → PAGE/LINE block rows.

    Segments the decoded text into lines of {LINE_WORDS} words and
    pages of {PAGE_LINES} lines — the block granularity Textract
    returns (PAGE containing LINE children), minus the id/relationship
    graph which operators/blocks.py exercises separately.
    """

    def extract_pipeline(self, doc_id: int, payload: bytes) -> list[dict[str, Any]]:
        words = payload.decode("utf-8").split(" ")
        lines = [
            " ".join(words[i : i + LINE_WORDS])
            for i in range(0, len(words), LINE_WORDS)
        ]
        out: list[dict[str, Any]] = []
        for page_idx in range(0, len(lines), PAGE_LINES):
            page_no = page_idx // PAGE_LINES + 1
            out.append(
                {
                    "doc_id": doc_id,
                    "page_no": page_no,
                    "line_no": 0,
                    "block_type": "PAGE",
                    "text": None,
                }
            )
            for j, line in enumerate(lines[page_idx : page_idx + PAGE_LINES], start=1):
                out.append(
                    {
                        "doc_id": doc_id,
                        "page_no": page_no,
                        "line_no": j,
                        "block_type": "LINE",
                        "text": line,
                    }
                )
        return out


class ProductionExtractor:
    """Textract-shaped extractor: start → poll → paginate, with retry.

    ``start_job(payload) -> job_id``; ``get_status(job_id) -> str``
    (IN_PROGRESS/SUCCEEDED/FAILED); ``get_blocks(job_id) ->
    (blocks, next_token)`` — the three remote calls of
    textract_extractor_document.py:87-124, each wrapped in the A10
    retry policy. ``sleep`` is injectable so tests don't wait 5 s.
    """

    def __init__(
        self,
        start_job: Callable[[bytes], str] | None = None,
        get_status: Callable[[str], str] | None = None,
        get_blocks: Callable[[str, str | None], tuple[list[dict], str | None]] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        if start_job is None or get_status is None or get_blocks is None:
            raise NotImplementedError(
                "ProductionExtractor needs injected Textract-shaped callables; "
                "use FakeExtractor for deterministic in-process runs"
            )
        self._start = start_job
        self._status = get_status
        self._blocks = get_blocks
        self._sleep = sleep

    def extract_pipeline(self, doc_id: int, payload: bytes) -> list[dict[str, Any]]:
        job_id = with_throttling_retry(self._start, payload)
        while True:
            status = with_throttling_retry(self._status, job_id)
            if status == "SUCCEEDED":
                break
            if status == "FAILED":
                raise RuntimeError(f"extract job {job_id} failed")
            self._sleep(POLL_INTERVAL_S)
        blocks: list[dict[str, Any]] = []
        token: str | None = None
        while True:
            page, token = with_throttling_retry(self._blocks, job_id, token)
            blocks.extend(page)
            if token is None:
                break
        for b in blocks:
            b["doc_id"] = doc_id
        return blocks


def extract_blocks(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """S4 as a DataFrame op: (doc_id, binary) → blocks rows (UDTF shape).

    The port is constructed inside the task (the production port holds
    an unpicklable client); one Arrow batch in, a longer blocks batch
    out.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        port = FakeExtractor()
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[content_col]):
                if payload is None:
                    # NULL document body -> no blocks: matches the oracle's
                    # unnest(generate_series(1, NULL)) row drop, and models
                    # an extractor that has nothing to upload.
                    continue
                rows.extend(port.extract_pipeline(int(doc_id), bytes(payload)))
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "line_no", "block_type", "text"])

    from sbs_suptech_etl_v2_spark.io import spread

    # OCR fan-out wants maximum width (remote-call throughput);
    # single-row-group test scans otherwise arrive 1-partition
    return spread(docs).mapInPandas(run, BLOCKS_SCHEMA)
