"""Deterministic deathmetal fixture CSVs per FIXTURES.md §A.

Generates landing/{albums,bands,reviews}/ with every quirk the
reference defends against: messy headers, literal 'None' strings,
Brazil case variants, lenient-cast junk ('N/A'), active-range strings,
embedded header rows, pipe characters, exact duplicate rows, and a
chunked multi-file variant with a header per chunk.
"""

from __future__ import annotations

import csv
import os
import random
from pathlib import Path

COUNTRIES = [
    "Sweden", "Norway", "Finland", "Brazil", "brazil", " Brasil ",
    "United States", "Germany", "Poland", "United Kingdom", "Canada",
    "Netherlands", "France", "Japan",
]
GENRES = ["Death Metal", "Doom/Death", "Tech Death", "Old School Death Metal"]
THEMES = ["Death", "Gore", "War", "Occult", "Philosophy"]
ACTIVES = ["1990-present", "1987-1993, 1997-", "1995-2005", "unknown", "2001-present"]

N_BANDS = 30
N_ALBUMS = 120
N_REVIEWS = 600


def generate(base_dir: str, seed: int = 7) -> dict[str, str]:
    """Write landing CSVs; returns {dataset: dir}. Deterministic."""
    rng = random.Random(seed)
    landing = Path(base_dir) / "landing"

    # ---- bands: messy headers (strip/lower/space-normalize targets) ----
    bands_dir = landing / "bands"
    bands_dir.mkdir(parents=True, exist_ok=True)
    bands_rows = []
    for i in range(1, N_BANDS + 1):
        # Concentrate >10 bands in Sweden so top-10-per-country truncates.
        country = "Sweden" if i <= 15 else COUNTRIES[i % len(COUNTRIES)]
        bands_rows.append(
            [
                i,
                "None" if i in (7, 19) else f"Band {i}",
                country,
                GENRES[i % len(GENRES)],
                THEMES[i % len(THEMES)],
                "Active" if i % 3 else "Split-up",
                "N/A" if i % 11 == 0 else str(1980 + (i % 25)),
                ACTIVES[i % len(ACTIVES)],
            ]
        )
    with open(bands_dir / "bands.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([" Id ", "Name", "COUNTRY", "Genre", "Theme", "Status", "Formed In", "Active"])
        w.writerows(bands_rows)

    # ---- albums: chunked into 3 files, each re-starting with header ----
    albums_dir = landing / "albums"
    albums_dir.mkdir(parents=True, exist_ok=True)
    albums_rows = []
    for i in range(1, N_ALBUMS + 1):
        band = rng.randint(1, N_BANDS + 3)  # 31-33 = orphan FKs
        year = "" if i % 17 == 0 else str(1985 + (i % 35))
        title = f"Album {i}, Part {i % 3}" if i % 5 == 0 else f"Album {i}"
        albums_rows.append([i, title, band, year])
    chunk_size = (len(albums_rows) + 2) // 3
    for part in range(3):
        rows = albums_rows[part * chunk_size : (part + 1) * chunk_size]
        with open(albums_dir / f"albums_{part:05d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["id", "title", "band", "year"])
            w.writerows(rows)

    # ---- reviews: embedded headers, pipes, 'None', exact duplicates ----
    reviews_dir = landing / "reviews"
    reviews_dir.mkdir(parents=True, exist_ok=True)
    reviews_rows = []
    for i in range(1, N_REVIEWS + 1):
        # Target albums 1..110 plus orphan FKs 121..126; albums 111..120
        # are guaranteed review-less (right-join null path).
        album = rng.choice([*range(1, N_ALBUMS - 9), *range(N_ALBUMS + 1, N_ALBUMS + 7)])
        title = "None" if i % 29 == 0 else f"Review {i}"
        score = round(rng.uniform(0, 100), 2)
        content = f"part a|part b|{i}" if i % 4 == 0 else f"solid review {i}"
        reviews_rows.append([i, album, title, score, content])
    header = ["id", "album", "title", "score", "content"]
    # Inject embedded header rows (chunked-landing residue) and dup rows.
    injected: list[list] = []
    for i, row in enumerate(reviews_rows):
        if i in (150, 380):
            injected.append(list(header))
        injected.append(row)
        if i in (42, 99, 500):
            injected.append(list(row))  # exact duplicate
    with open(reviews_dir / "reviews.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(injected)

    return {ds: str(landing / ds) for ds in ("albums", "bands", "reviews")}
