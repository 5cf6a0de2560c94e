"""Custom Python Data Source (Spark 4 DataSource API) for observations.

The reference fetches per-station observations with a SERIAL driver-side
loop (``fmi_client.py:112-130``); ``sources/rest.py`` keeps that shape
(an injectable driver-side fetch). This module is the scalable
architecture for the same feed: a first-class ``spark.read.format(...)``
source where EACH STATION IS AN INPUT PARTITION, so the fetches run on
executors in parallel, retry per partition, and compose with every
downstream operator — the difference between "a script that calls an
API" and "a table the engine can scan".

    spark.dataSource.register(ObservationDataSource)
    df = (spark.read.format("fmi_observations")
          .option("stations", "s1,s2,s3")
          .option("sample_path", "...json")   # fixture transport
          .load())

Rows surface with every field as STRING — the same dirtiness contract as
the Kafka/JSON payloads — so ``apply_schema`` does identical work on all
ingestion paths.

A streaming variant (``fmi_observations_stream``) implements the
DataSourceStreamReader protocol: offsets are row positions into the
feed, each micro-batch serves the newly arrived slice, partitions split
the slice for parallel reads, and a checkpoint restart resumes from the
committed offset — the full custom-source contract
(initialOffset/latestOffset/partitions/read) on which any bespoke
transport (internal queue, vendor API, change feed) can be modeled.

Transport note: this container has no network, so the default transport
is a fixture file (``sample_path``); a deployment drops its HTTP client
into :func:`_fetch_station` — the partitioning, retries, and schema
contract do not change.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: the raw-payload schema: every field a string (the dirtiness contract).
RAW_FIELDS = (
    "station_id",
    "station_name",
    "latitude",
    "longitude",
    "timestamp",
    "temperature",
    "humidity",
    "wind_speed",
)
RAW_SCHEMA = ", ".join(f"{f} string" for f in RAW_FIELDS)


def _load_rows(sample_path: str) -> list[dict]:
    with open(sample_path) as fh:
        return json.load(fh)


def _to_tuple(row: dict) -> tuple:
    return tuple(
        None if row.get(f) is None else str(row.get(f)) for f in RAW_FIELDS
    )


def _fetch_station(station_id: str, sample_path: str) -> list[tuple]:
    """Per-partition fetch — runs ON AN EXECUTOR.

    The fixture transport filters the sample feed to this partition's
    station; a live deployment replaces the body with its HTTP client
    (plus sources/rest.with_retries) — one connection per partition, the
    documented custom-source pattern.
    """
    return [
        _to_tuple(r)
        for r in _load_rows(sample_path)
        if str(r.get("station_id")) == station_id
    ]


class _StationPartition(InputPartition):
    def __init__(self, station_id: str):
        self.station_id = station_id


class ObservationReader(DataSourceReader):
    def __init__(self, options):
        self.sample_path = options.get("sample_path")
        if not self.sample_path:
            raise ValueError("option 'sample_path' is required (transport)")
        stations = options.get("stations")
        if stations:
            self.stations = [s for s in stations.split(",") if s]
        else:  # discover from the feed (driver-side, metadata-sized)
            self.stations = sorted(
                {str(r.get("station_id")) for r in _load_rows(self.sample_path)}
            )

    def partitions(self):
        # one partition per station: the unit of fetch parallelism AND of
        # retry isolation — a failing station re-fetches alone
        return [_StationPartition(s) for s in self.stations]

    def read(self, partition):
        yield from _fetch_station(partition.station_id, self.sample_path)


class ObservationDataSource(DataSource):
    """``spark.read.format("fmi_observations")`` — batch."""

    @classmethod
    def name(cls) -> str:
        return "fmi_observations"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema):
        return ObservationReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ObservationStreamReader(DataSourceStreamReader):
    """Micro-batch protocol over the feed: offset = rows consumed.

    ``rows_per_batch`` caps each micro-batch (the reference's 500-row
    buffer, kafka_stream.py:336); within a batch the slice splits into
    ``parallelism`` partitions so executors share the read.
    """

    def __init__(self, options):
        self.sample_path = options.get("sample_path")
        if not self.sample_path:
            raise ValueError("option 'sample_path' is required (transport)")
        self.rows_per_batch = int(options.get("rows_per_batch", "500"))
        self.parallelism = int(options.get("parallelism", "2"))
        self.total = len(_load_rows(self.sample_path))
        self._pos = 0  # driver-side rate-limit cursor (see latestOffset)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # rate limiting lives in the source: advance the cursor at most
        # rows_per_batch per trigger. A live source derives this from the
        # transport's high-water mark; the replayed-batch clamp in
        # partitions() re-syncs the cursor after a checkpoint restart.
        self._pos = min(self.total, self._pos + self.rows_per_batch)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        # restart re-sync: the engine replays the write-ahead-logged batch
        # first — never let the fresh cursor fall behind a committed end
        self._pos = max(self._pos, hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, (hi - lo + self.parallelism - 1) // self.parallelism)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition):
        rows = _load_rows(self.sample_path)
        for r in rows[partition.start : partition.end]:
            yield _to_tuple(r)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint holds the committed offset; nothing external


class ObservationStreamDataSource(DataSource):
    """``spark.readStream.format("fmi_observations_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "fmi_observations_stream"

    def schema(self) -> str:
        return RAW_SCHEMA

    def streamReader(self, schema):
        return ObservationStreamReader(self.options)


def register(spark) -> None:
    """Register both formats on the session (idempotent)."""
    spark.dataSource.register(ObservationDataSource)
    spark.dataSource.register(ObservationStreamDataSource)
