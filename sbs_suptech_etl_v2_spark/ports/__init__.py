"""Port layer — the engine's user-extensibility surface (SURVEY §2.11).

The reference is a hexagonal architecture: external services hide
behind ports (transform/extract/load/notify). Here each port has a
production-shaped implementation (retry/backoff + bounded concurrency
around an external call) and a deterministic in-memory fake for the
oracle-checked queries and golden tests.
"""

from sbs_suptech_etl_v2_spark.ports.transformer import (
    FakeTransformer,
    ProductionTransformer,
    ThrottlingError,
    TransientError,
    bounded_map,
    with_throttling_retry,
)

__all__ = [
    "FakeTransformer",
    "ProductionTransformer",
    "ThrottlingError",
    "TransientError",
    "bounded_map",
    "with_throttling_retry",
]
