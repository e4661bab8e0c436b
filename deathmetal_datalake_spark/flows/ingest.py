"""Ingest flow: source CSVs → chunked landing layout.

Reference: ``ingest_folder_flow`` (``flows/landing.py:69-74``) — list
CSVs, chunk each into ≤900 KB records with the header re-attached, route
by dataset name. The Kinesis/Firehose hop is replaced by the landing
directory that Structured Streaming (streaming.landing) or the batch
bronze flow consumes; per-entity subdirectories play the role of the
per-entity streams (``infra/main.tf:47-60``).
"""

from __future__ import annotations

import os
from pathlib import Path

from deathmetal_datalake_spark.streaming.landing import chunk_csv


def list_csv(folder: str) -> list[str]:
    """S1: glob *.csv sorted (``flows/landing.py:22-24``)."""
    return sorted(str(p) for p in Path(folder).glob("*.csv"))


def ingest_folder(
    source_dir: str, landing_dir: str, max_bytes: int = 900 * 1024
) -> dict[str, list[str]]:
    """Chunk every ``{source_dir}/{dataset}.csv`` into
    ``{landing_dir}/{dataset}/`` (dataset name = file stem, the routing
    key of ``flows/landing.py:31-35``). Returns dataset → chunk paths."""
    out: dict[str, list[str]] = {}
    for csv_path in list_csv(source_dir):
        dataset = Path(csv_path).stem.lower()  # `flows/landing.py:30`
        out[dataset] = chunk_csv(csv_path, os.path.join(landing_dir, dataset), max_bytes)
    return out
