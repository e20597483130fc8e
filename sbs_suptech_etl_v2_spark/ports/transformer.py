"""Transform-document port — A2/A3/A4 with A9/A10 (SURVEY §2.9).

The reference extracts structured fields from document text with an
LLM behind a port (src/application/ports/transform_document_port.py:7-19;
Bedrock adapter src/infrastructure/adapters/transformers/
bed_rock_transformer_document.py:42-105), wrapped in app-level
throttling retry (:107-145) and bounded page concurrency
(helpers/extract_async_helper.py:60-89).

Spark-first restatement: the port is plain Python invoked inside a
``mapInPandas`` batch (operators/extraction.py). This module provides:

- ``with_throttling_retry`` — A10: ≤5 retries on throttling/transient
  errors, exponential backoff ``min(base·2^r + U(0,1), 30 s)`` —
  the reference's exact policy constants.
- ``bounded_map`` — A9: order-preserving map with ≤4 concurrent calls
  (the reference's 4×4 page batching); Spark supplies inter-partition
  parallelism, this bounds intra-partition concurrency so an
  external API sees ``executors × 4`` in-flight requests, not
  ``executors × batch``.
- ``FakeTransformer`` — deterministic regex extraction implementing
  the prompts' *extraction intent* (the fields the Spanish prompts ask
  Claude for), so oracle/golden tests are meaningful.
- ``ProductionTransformer`` — the Bedrock-shaped adapter: same retry/
  concurrency envelope around a pluggable ``llm_call``; without an
  injected client it raises, keeping AWS strictly out of this repo.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import Any

MAX_RETRIES = 5
BACKOFF_BASE = 1.0
BACKOFF_FACTOR = 2.0
MAX_BACKOFF = 30.0
MAX_CONCURRENCY = 4


class ThrottlingError(Exception):
    """External-service throttling (the reference's ThrottlingException)."""


class TransientError(Exception):
    """Transient network/timeout failure (reference's ReadTimeout etc.)."""


def with_throttling_retry(
    func: Callable[..., Any],
    *args: Any,
    max_retries: int = MAX_RETRIES,
    backoff_base: float = BACKOFF_BASE,
    backoff_factor: float = BACKOFF_FACTOR,
    max_backoff: float = MAX_BACKOFF,
    sleep: Callable[[float], None] = time.sleep,
    jitter: Callable[[], float] | None = None,
    **kwargs: Any,
) -> Any:
    """A10 — run ``func`` with the reference's retry policy.

    Retries ``ThrottlingError``/``TransientError`` up to ``max_retries``
    times, waiting ``min(base·factor^r + jitter(), cap)`` between
    attempts; any other exception (or exhaustion) propagates.
    ``sleep``/``jitter`` are injectable so tests run instantly and
    deterministically (production jitter is U(0,1), as in
    bed_rock_transformer_document.py:130).
    """
    if jitter is None:
        import random

        jitter = random.random
    retries = 0
    while True:
        try:
            return func(*args, **kwargs)
        except (ThrottlingError, TransientError):
            if retries >= max_retries:
                raise
            wait = min(backoff_base * (backoff_factor**retries) + jitter(), max_backoff)
            sleep(wait)
            retries += 1


def bounded_map(
    func: Callable[[Any], Any],
    items: Sequence[Any] | Iterable[Any],
    max_concurrency: int = MAX_CONCURRENCY,
) -> list[Any]:
    """A9 — order-preserving concurrent map with bounded in-flight calls.

    ``ThreadPoolExecutor.map`` keeps result order regardless of
    completion order (the reference gathers page batches the same way,
    extract_async_helper.py:60-89). Threads suit the IO-bound LLM/OCR
    calls this wraps; CPU-bound work should stay in Spark expressions.
    """
    items = list(items)
    if not items:
        return []
    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        return list(pool.map(func, items))


# --- deterministic fake (regex-backed extraction intent) -----------------

# Field patterns mirror what the reference's Spanish prompts ask the LLM
# to find (bed_rock_transformer_document.py:47-56, 90-100): the policy
# number near "póliza", holder near "Asegurado", validity dates after
# "desde el"/"hasta el"; appraiser near "Perito", values after
# "Valor comercial"/"Valor de realización", owner after "Propietario".
POLIZAS_PATTERNS: dict[str, str] = {
    "policy_number": r"POL-\d+",
    "policy_name": r"Asegurado: ([A-Z]+ \d+)",
    "policy_start_date": r"desde el (\d{2}/\d{2}/\d{4})",
    "policy_end_date": r"hasta el (\d{2}/\d{2}/\d{4})",
}

TASACIONES_PATTERNS: dict[str, str] = {
    "expert_warranty_name": r"Perito: ([A-Z]+ \d+)",
    "tasacion_date": r"Fecha de tasacion: (\d{2}/\d{2}/\d{4})",
    "commercial_value": r"Valor comercial: S/ (\d+)",
    "realization_value": r"Valor de realizacion: S/ (\d+)",
    "tasacion_owner": r"Propietario: ([A-Z]+ \d+)",
}

INSCRIPCIONES_PATTERNS: dict[str, str] = {
    "inscription_number": r"Partida N (\d+)",
    "legal_name": r"a favor de ([A-Z]+ \d+)",
    "inscription_date": r"presentado el (\d{2}/\d{2}/\d{4})",
}


def _extract(patterns: dict[str, str], content: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for field, pat in patterns.items():
        m = re.search(pat, content)
        if m is None:
            out[field] = None
        else:
            out[field] = m.group(1) if m.groups() else m.group(0)
    return out


class FakeTransformer:
    """Deterministic TransformDocumentPort — regex extraction intent.

    Field-for-field equivalent of the pydantic output schemas the
    reference binds via ``with_structured_output``
    (etl_polizas_state.py:6-10, etl_tasaciones_state.py:7-11,
    etl_inscripciones_state.py:9-16), computable identically by the
    DuckDB oracle (same regexes via ``regexp_extract``).
    """

    def llm_caller_polizas(self, content: str) -> dict[str, str | None]:
        return _extract(POLIZAS_PATTERNS, content)

    def llm_caller_inscripciones(self, content: str) -> dict[str, str | None]:
        return _extract(INSCRIPCIONES_PATTERNS, content)

    def llm_caller_tasaciones(self, content: str) -> dict[str, str | None]:
        return _extract(TASACIONES_PATTERNS, content)


class ProductionTransformer:
    """Production-shaped TransformDocumentPort.

    Wraps a pluggable ``llm_call(domain, content) -> dict`` (an
    injected Bedrock/LLM client) in the A10 retry policy. Every caller
    goes through ``with_throttling_retry`` exactly like the reference
    adapter (bed_rock_transformer_document.py:42-44,62-64,86-88).
    Without an injected client the port fails fast — AWS SDKs and
    credentials stay outside this repo.
    """

    def __init__(self, llm_call: Callable[[str, str], dict[str, str | None]] | None = None):
        if llm_call is None:
            raise NotImplementedError(
                "ProductionTransformer needs an injected llm_call client; "
                "use FakeTransformer for deterministic in-process runs"
            )
        self._llm_call = llm_call

    def llm_caller_polizas(self, content: str) -> dict[str, str | None]:
        return with_throttling_retry(self._llm_call, "polizas", content)

    def llm_caller_inscripciones(self, content: str) -> dict[str, str | None]:
        return with_throttling_retry(self._llm_call, "inscripciones", content)

    def llm_caller_tasaciones(self, content: str) -> dict[str, str | None]:
        return with_throttling_retry(self._llm_call, "tasaciones", content)
