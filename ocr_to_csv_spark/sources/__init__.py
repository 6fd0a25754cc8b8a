"""Table sources/sinks: format-abstracted catalog (parquet here,
Iceberg in production — see catalog.py for the exact API mapping)."""

from .catalog import Catalog  # noqa: F401
from .snapshots import SnapshotCatalog  # noqa: F401
