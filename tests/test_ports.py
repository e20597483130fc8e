"""Unit tests for the port layer — A9/A10 semantics (SURVEY §2.9).

Pure-Python tests (no Spark session): retry policy timing/limits,
bounded-map ordering, fake-transformer extraction intent.
"""

from __future__ import annotations

import threading

import pytest

from sbs_suptech_etl_v2_spark.ports import (
    FakeTransformer,
    ProductionTransformer,
    ThrottlingError,
    TransientError,
    bounded_map,
    with_throttling_retry,
)


class Flaky:
    def __init__(self, failures: int, exc: type[Exception] = ThrottlingError):
        self.failures = failures
        self.calls = 0
        self.exc = exc

    def __call__(self, x):
        self.calls += 1
        if self.calls <= self.failures:
            raise self.exc("throttled")
        return x * 2


def test_retry_succeeds_after_throttling():
    waits: list[float] = []
    flaky = Flaky(failures=3)
    out = with_throttling_retry(
        flaky, 21, sleep=waits.append, jitter=lambda: 0.5
    )
    assert out == 42
    assert flaky.calls == 4
    # reference policy: min(1.0 * 2^r + jitter, 30) for r = 0, 1, 2
    assert waits == [1.5, 2.5, 4.5]


def test_retry_backoff_is_capped():
    waits: list[float] = []
    flaky = Flaky(failures=5, exc=TransientError)
    with_throttling_retry(flaky, 1, sleep=waits.append, jitter=lambda: 0.0)
    assert waits == [1.0, 2.0, 4.0, 8.0, 16.0]
    waits2: list[float] = []
    flaky2 = Flaky(failures=5)
    with_throttling_retry(
        flaky2, 1, sleep=waits2.append, jitter=lambda: 0.0, backoff_base=4.0
    )
    assert waits2 == [4.0, 8.0, 16.0, 30.0, 30.0]  # capped at 30 s


def test_retry_exhaustion_raises():
    flaky = Flaky(failures=10)
    with pytest.raises(ThrottlingError):
        with_throttling_retry(flaky, 1, sleep=lambda _: None, jitter=lambda: 0.0)
    assert flaky.calls == 6  # initial + 5 retries


def test_retry_does_not_catch_other_errors():
    def boom(_):
        raise ValueError("not transient")

    with pytest.raises(ValueError):
        with_throttling_retry(boom, 1, sleep=lambda _: None)


def test_bounded_map_preserves_order_and_bounds_concurrency():
    in_flight = 0
    peak = 0
    lock = threading.Lock()
    gate = threading.Event()

    def slowish(x):
        nonlocal in_flight, peak
        with lock:
            in_flight += 1
            peak = max(peak, in_flight)
        gate.wait(0.01)
        with lock:
            in_flight -= 1
        return x * x

    out = bounded_map(slowish, range(50), max_concurrency=4)
    assert out == [x * x for x in range(50)]
    assert peak <= 4


def test_bounded_map_empty():
    assert bounded_map(lambda x: x, []) == []


def test_fake_transformer_polizas_intent():
    t = FakeTransformer()
    out = t.llm_caller_polizas(
        "POLIZA DE SEGURO POL-7 | Asegurado: CLIENTE 7 | "
        "Vigencia desde el 01/08/2022 hasta el 01/08/2023"
    )
    assert out == {
        "policy_number": "POL-7",
        "policy_name": "CLIENTE 7",
        "policy_start_date": "01/08/2022",
        "policy_end_date": "01/08/2023",
    }
    missing = t.llm_caller_polizas("POLIZA DE SEGURO POL-13 | Vigencia perpetua")
    assert missing["policy_number"] == "POL-13"
    assert missing["policy_name"] is None
    assert missing["policy_start_date"] is None


def test_fake_transformer_tasaciones_intent():
    t = FakeTransformer()
    out = t.llm_caller_tasaciones(
        "INFORME DE TASACION | Perito: ING 3 | Fecha de tasacion: 05/02/2019 | "
        "Valor comercial: S/ 250000 | Valor de realizacion: S/ 225000 | "
        "Propietario: SOC 11"
    )
    assert out["expert_warranty_name"] == "ING 3"
    assert out["commercial_value"] == "250000"
    assert out["realization_value"] == "225000"
    assert out["tasacion_owner"] == "SOC 11"


def test_production_transformer_requires_client():
    with pytest.raises(NotImplementedError):
        ProductionTransformer()


def test_production_transformer_retries_injected_client():
    calls = {"n": 0}

    def llm_call(domain, content):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ThrottlingError()
        return {"domain": domain, "len": str(len(content))}

    # patch the retry sleep so the test is instant
    import sbs_suptech_etl_v2_spark.ports.transformer as tr

    orig = tr.time.sleep
    tr.time.sleep = lambda _: None
    try:
        port = ProductionTransformer(llm_call)
        out = port.llm_caller_polizas("texto")
    finally:
        tr.time.sleep = orig
    assert out == {"domain": "polizas", "len": "5"}
    assert calls["n"] == 2
