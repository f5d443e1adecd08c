from .manifest import (
    IndexManifest,
    ensure_index,
    read_manifest,
    source_fingerprint,
    staleness_reasons,
    write_manifest,
)
from .tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "TABLE_NAMES", "load_table", "load_tables",
    "IndexManifest", "ensure_index", "read_manifest",
    "source_fingerprint", "staleness_reasons", "write_manifest",
]
