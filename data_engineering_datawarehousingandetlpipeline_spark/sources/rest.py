"""REST observation source adapter (reference S2, F5, S9).

The reference fetches per-station observations from the FMI API with a
serial driver-side loop (``fmi_client.py:112-130``) and lenient per-field
extraction over candidate keys (``_extract_value``, ``:73-94``). The Spark
shape keeps the fetch driver-side (an external API is not a distributed
scan) but lands rows into a typed DataFrame immediately, so everything
downstream is the shared cleaning pipeline.

The HTTP call itself is injectable: the container has no network and no
``fmi_weather_client``, so the default fetcher raises — tests inject a
fixture-backed fetcher, production injects the real client.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_engineering_datawarehousingandetlpipeline_spark.schema import (
    OBSERVATION_SCHEMA,
    apply_schema,
)

#: candidate payload keys per canonical column (fmi_client.py:96-110).
FIELD_CANDIDATES: dict[str, tuple[str, ...]] = {
    "station_id": ("station_id", "fmisid", "id"),
    "station_name": ("station_name", "name"),
    "latitude": ("latitude", "lat"),
    "longitude": ("longitude", "lon", "lng"),
    "timestamp": ("timestamp", "time", "observation_time"),
    "temperature": ("temperature", "t2m", "temp"),
    "humidity": ("humidity", "rh"),
    "wind_speed": ("wind_speed", "ws_10min", "wind"),
}

Fetcher = Callable[[str], dict[str, Any] | None]


def _default_fetcher(station_id: str) -> dict[str, Any] | None:  # pragma: no cover
    raise NotImplementedError(
        "no live FMI API access in this environment; inject a fetcher "
        "(e.g. fixture-backed) or use sources.readers.read_observations_json"
    )


def with_retries(
    fetcher: Fetcher,
    attempts: int = 5,
    delay_seconds: float = 2.0,
    sleep: Callable[[float], None] | None = None,
) -> Fetcher:
    """S9: retry/backoff wrapper for a flaky fetcher.

    Mirrors ``_connect_with_retries`` (kafka_stream.py:21-50): ``attempts``
    tries with a fixed delay, re-raising the last error. Spark's own
    sources retry internally (SURVEY.md §2.1) — this exists only for the
    driver-side REST adapter, the one boundary Spark does not manage.
    ``sleep`` is injectable so tests don't wait.
    """
    import time

    do_sleep = sleep if sleep is not None else time.sleep

    def fetch(station_id: str) -> dict[str, Any] | None:
        last_error: Exception | None = None
        for attempt in range(attempts):
            try:
                return fetcher(station_id)
            except NotImplementedError:
                raise
            except Exception as exc:
                last_error = exc
                if attempt < attempts - 1:
                    do_sleep(delay_seconds)
        raise last_error  # type: ignore[misc]

    return fetch


def extract_fields(payload: dict[str, Any]) -> dict[str, Any]:
    """F5: lenient extraction over candidate keys; first present key wins."""
    row: dict[str, Any] = {}
    for column, candidates in FIELD_CANDIDATES.items():
        value = None
        for key in candidates:
            if key in payload and payload[key] is not None:
                value = payload[key]
                break
        row[column] = value
    return row


def fetch_observations(
    spark: SparkSession,
    station_ids: Sequence[str],
    fetcher: Fetcher = _default_fetcher,
) -> DataFrame:
    """S2: per-station fetch → typed DataFrame via the lenient schema.

    Stations that fail or return nothing are skipped (reference behavior:
    ``_fetch_station_observation`` returns None on error). All values pass
    through ``apply_schema``'s try_cast coercion, so a fetcher may return
    strings/ints/floats freely.
    """
    rows = []
    for station_id in station_ids:
        try:
            payload = fetcher(station_id)
        except NotImplementedError:
            raise
        except Exception:
            payload = None
        if payload:
            extracted = extract_fields(payload)
            rows.append({k: None if v is None else str(v) for k, v in extracted.items()})
    raw_schema = ", ".join(f"{f.name} string" for f in OBSERVATION_SCHEMA.fields)
    raw = spark.createDataFrame(rows, schema=raw_schema)
    return apply_schema(raw, OBSERVATION_SCHEMA)
