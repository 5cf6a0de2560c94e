"""Pipeline configuration (reference §1.3: env-var dataclass).

Mirrors ``PipelineConfig`` (reference ``src/data_processing/config.py:25-61``)
with the warehouse-specific fields translated to the Spark stack:

- BigQuery project/dataset/table → the lakehouse ``warehouse_root`` path
  (the table identity here is a partitioned path, not a SaaS dataset),
- ``watermark_path`` (the consumer's JSON state file) → the Structured
  Streaming ``checkpoint_dir`` (offsets + state live there; no separate
  watermark file exists, see warehouse/store.py),
- micro-batch knobs surfaced explicitly (they were argparse defaults in
  the reference CLI, kafka_stream.py:336, :411-421).

The reference's duplicated ``use_sample_data`` field and dead
``bigquery_api_key_path`` module global (§2.10.4) are intentionally not
replicated.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

#: reference default whitelist (config.py:46-57) — six FMI station ids.
DEFAULT_STATION_WHITELIST: tuple[str, ...] = (
    "101976",  # Näkkälä
    "100723",  # Espoo Luukki
    "101784",  # Hailuoto Marjaniemi
    "102033",  # Inari Ivalo lentoasema
    "101339",  # Jyväskylä lentoasema
    "101725",  # Kajaani lentoasema
)


def _list_from_env(raw: str | None) -> tuple[str, ...] | None:
    if not raw:
        return None
    items = tuple(part.strip() for part in raw.split(",") if part.strip())
    return items or None


def _bool_from_env(name: str, default: bool = False) -> bool:
    return os.getenv(name, str(default).lower()).lower() == "true"


@dataclass(frozen=True)
class PipelineConfig:
    """Centralized runtime configuration, sourced from environment variables."""

    kafka_bootstrap_servers: str = field(
        default_factory=lambda: os.getenv("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    )
    kafka_topic: str = field(
        default_factory=lambda: os.getenv("KAFKA_TOPIC", "fmi_observations")
    )
    warehouse_root: str = field(
        default_factory=lambda: os.getenv("WAREHOUSE_ROOT", "./warehouse/weather")
    )
    checkpoint_dir: str = field(
        default_factory=lambda: os.getenv("CHECKPOINT_DIR", "./checkpoints/ingest")
    )
    use_sample_data: bool = field(
        default_factory=lambda: _bool_from_env("USE_SAMPLE_DATA", False)
    )
    station_whitelist: tuple[str, ...] = field(
        default_factory=lambda: _list_from_env(os.getenv("STATION_WHITELIST"))
        or DEFAULT_STATION_WHITELIST
    )
    #: consumer micro-batch bounds (reference kafka_stream.py:336)
    batch_size: int = field(
        default_factory=lambda: int(os.getenv("BATCH_SIZE", "500"))
    )
    flush_interval_seconds: int = field(
        default_factory=lambda: int(os.getenv("FLUSH_INTERVAL_SECONDS", "10"))
    )
    produce_interval_seconds: int = field(
        default_factory=lambda: int(os.getenv("PRODUCE_INTERVAL_SECONDS", "60"))
    )


def load_config() -> PipelineConfig:
    """Read configuration from the current environment."""
    return PipelineConfig()
