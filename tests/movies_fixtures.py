"""Deterministic movies star/bridge fixture generator (FIXTURES.md).

Builds the reference's five content tables (reference
postgres/init.sql:35-101) as parquet with every required edge case:

1. film with no genres and no persons            (fw-empty)
2. film with multiple genres AND multiple persons (fw-multi)
3. film with no director                          (fw-nodirector)
4. film with exactly one writer                   (fw-onewriter)
5. same person in multiple roles on one film      (fw-multirole)
6. genre with zero films                          (g-empty)
7. person with zero films                         (p-empty)
8. rows with modified == checkpoint (strict-> exclusion)
9. person/genre edit newer than its films (dependency recompute)
10. mixed-case en+ru text with stopwords/near-misses (search goldens)
11. titles differing by case/punctuation (collation pinning)
12. uuid substring shared by >1 row (icontains detail)

Deterministic: fixed uuids/timestamps, no RNG.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _u(prefix: str, i: int) -> str:
    """Deterministic uuid-shaped id; prefix visible for debugging."""
    body = f"{i:012d}"
    return f"{prefix:0>8.8}-0000-4000-8000-{body}"


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


CHECKPOINT = _ts(10)  # rows at exactly this modified must be EXCLUDED


def build(out_dir: str) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)

    genres = [
        # id, name, description, created, modified
        (_u("67", 1), "Action", "boom", _ts(1), _ts(2)),
        (_u("67", 2), "Drama", None, _ts(1), _ts(3)),
        (_u("67", 3), "Комедия", "смешно и весело", _ts(1), _ts(4)),
        (_u("67", 4), "EmptyGenre", "no films here", _ts(1), _ts(5)),  # edge 6
        # edge 9: genre edited AFTER every film's own modified
        (_u("67", 5), "Sci-Fi", "space", _ts(1), _ts(20)),
    ]

    persons = [
        (_u("70", 1), "Greg Camp", _ts(1), _ts(2)),
        (_u("70", 2), "Craig Hutchinson", _ts(1), _ts(3)),
        (_u("70", 3), "Анна Каренина", _ts(1), _ts(4)),
        (_u("70", 4), "Bob Camper", _ts(1), _ts(5)),  # near-miss of "Camp"
        (_u("70", 5), "Lonely Person", _ts(1), _ts(6)),  # edge 7: no films
        # edge 9: person edited after films
        (_u("70", 6), "Late Editor", _ts(1), _ts(21)),
        (_u("70", 7), "O'Brien's Kid", _ts(1), _ts(7)),  # possessive token
    ]

    films = [
        # id, title, description, creation_date, rating, type, created, modified, certificate, file_path
        (_u("6f", 1), "Camp Stories", "A camp story with the camps and камп",
         dt.date(2000, 1, 1), 7.5, "movie", _ts(1), _ts(2), None, None),
        (_u("6f", 2), "camp stories II", "sequel at the summer camp", dt.date(2001, 2, 2),
         6.0, "movie", _ts(1), _ts(3), None, None),  # edge 11: case-only title diff
        (_u("6f", 3), "!Camp the Third", "N//A value present N/A here", dt.date(2002, 3, 3),
         None, "TV", dt.datetime(2024, 1, 1), _ts(4), None, None),  # punct title, odd type spelling
        (_u("6f", 4), "Empty Movie", None, None, 1.0, "movie", _ts(1), _ts(5), None, None),  # edge 1
        (_u("6f", 5), "Multi Everything", "genres and persons galore", dt.date(2003, 4, 4),
         9.9, "movie", _ts(1), _ts(6), None, None),  # edge 2
        (_u("6f", 6), "No Director Here", "writers only", dt.date(2004, 5, 5),
         5.5, "tv_show", _ts(1), _ts(7), None, None),  # edge 3
        (_u("6f", 7), "One Writer Film", "однажды в студёную зимнюю пору", dt.date(2005, 6, 6),
         4.4, "movie", _ts(1), _ts(8), None, None),  # edge 4
        (_u("6f", 8), "Checkpoint Edge", "modified equals checkpoint exactly",
         dt.date(2006, 7, 7), 3.3, "movie", _ts(1), CHECKPOINT, None, None),  # edge 8
        (_u("6f", 9), "Stale Film Fresh Person", "film old, person edited later",
         dt.date(2007, 8, 8), 2.2, "movie", _ts(1), _ts(5), None, None),  # edge 9
        (_u("6f", 10), "Stale Film Fresh Genre", "film old, genre edited later",
         dt.date(2008, 9, 9), 8.8, "movie", _ts(1), _ts(5), None, None),  # edge 9
    ]

    gfw = []  # id, genre_id, film_work_id, created
    pfw = []  # id, film_work_id, person_id, role, created
    k = 0

    def link_g(film_i: int, genre_i: int):
        nonlocal k
        k += 1
        gfw.append((_u("aa", k), _u("67", genre_i), _u("6f", film_i), _ts(1)))

    def link_p(film_i: int, person_i: int, role: str):
        nonlocal k
        k += 1
        pfw.append((_u("bb", k), _u("6f", film_i), _u("70", person_i), role, _ts(1)))

    link_g(1, 1); link_p(1, 1, "actor"); link_p(1, 2, "director")
    link_g(2, 1); link_g(2, 2); link_p(2, 1, "actor"); link_p(2, 4, "actor")
    link_g(3, 3); link_p(3, 3, "actor"); link_p(3, 3, "writer")  # edge 5 multi-role
    # film 4: no links at all (edge 1)
    link_g(5, 1); link_g(5, 2); link_g(5, 3)  # edge 2: multiple genres
    link_p(5, 1, "actor"); link_p(5, 2, "actor"); link_p(5, 3, "director")
    link_p(5, 4, "writer"); link_p(5, 2, "writer")  # AND multiple persons/roles
    link_p(6, 1, "writer"); link_p(6, 2, "writer")  # edge 3: no director
    link_p(7, 2, "writer")  # edge 4: exactly one writer
    link_p(7, 1, "director")
    link_g(8, 1); link_p(8, 1, "actor")
    link_p(9, 6, "actor")   # edge 9: Late Editor person on stale film
    link_g(10, 5)           # edge 9: Sci-Fi genre on stale film
    link_p(1, 7, "writer")

    tables = {
        "film_work": pa.table(
            {
                "id": [f[0] for f in films],
                "title": [f[1] for f in films],
                "description": [f[2] for f in films],
                "creation_date": pa.array([f[3] for f in films], pa.date32()),
                "rating": pa.array([f[4] for f in films], pa.float64()),
                "type": [f[5] for f in films],
                "created": pa.array([f[6] for f in films], pa.timestamp("us")),
                "modified": pa.array([f[7] for f in films], pa.timestamp("us")),
                "certificate": pa.array([f[8] for f in films], pa.string()),
                "file_path": pa.array([f[9] for f in films], pa.string()),
            }
        ),
        "genre": pa.table(
            {
                "id": [g[0] for g in genres],
                "name": [g[1] for g in genres],
                "description": [g[2] for g in genres],
                "created": pa.array([g[3] for g in genres], pa.timestamp("us")),
                "modified": pa.array([g[4] for g in genres], pa.timestamp("us")),
            }
        ),
        "person": pa.table(
            {
                "id": [p[0] for p in persons],
                "full_name": [p[1] for p in persons],
                "created": pa.array([p[2] for p in persons], pa.timestamp("us")),
                "modified": pa.array([p[3] for p in persons], pa.timestamp("us")),
            }
        ),
        "genre_film_work": pa.table(
            {
                "id": [r[0] for r in gfw],
                "genre_id": [r[1] for r in gfw],
                "film_work_id": [r[2] for r in gfw],
                "created": pa.array([r[3] for r in gfw], pa.timestamp("us")),
            }
        ),
        "person_film_work": pa.table(
            {
                "id": [r[0] for r in pfw],
                "film_work_id": [r[1] for r in pfw],
                "person_id": [r[2] for r in pfw],
                "role": [r[3] for r in pfw],
                "created": pa.array([r[4] for r in pfw], pa.timestamp("us")),
            }
        ),
    }
    counts = {}
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = tbl.num_rows
    return counts
