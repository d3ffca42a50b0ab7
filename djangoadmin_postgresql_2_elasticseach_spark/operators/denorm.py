"""Denormalizing document builders — the reference's three ETL queries
(movies / genres / persons) as DataFrame transforms.

Reference queries: ``etl/main.py:24-38`` (movies), ``:40-49`` (genres),
``:51-60`` (persons); row-shaping ``index_prep_*`` at ``:67-119``.

Spark-first design decision (SURVEY §2.3 ⚠): the reference joins BOTH
bridge tables onto film_work in one query, materializing a genres ×
persons cross-product per film and collapsing it with DISTINCT inside the
aggregates. We aggregate each bridge independently (one small shuffle per
bridge, no blow-up) and then LEFT-join the per-film arrays back — output
arrays are identical (tests pin equality on films with multiple genres AND
multiple persons) and the plan scales linearly instead of quadratically
per film. At 100 TB the cross-product shape is the difference between a
working job and an OOM.

Ordering: PG's ``array_agg(DISTINCT ...)`` returns sorted distinct values;
we use ``array_sort(collect_set(...))`` for deterministic parity.
NULL semantics: PG's un-FILTERed ``array_agg`` keeps NULLs (``[NULL]`` for
a film with no genres — reference etl/main.py:29); the declared engine
semantics is the empty array (FIXTURES.md edge 1), via
``coalesce(..., array())``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLE_SYNONYMS = {
    # Data uses long spellings; Django choices use 2-letter codes
    # (reference etl/main.py:77-86 accepts both).
    "actor": ("actor", "AC"),
    "director": ("director", "DR"),
    "writer": ("writer", "WR"),
}


def _persons_per_film(person_film_work: DataFrame, person: DataFrame) -> DataFrame:
    """Per-film distinct person structs: one aggregation over the person
    bridge only (no genre cross-product).

    Mirrors the ``json_agg(DISTINCT jsonb_build_object('person_role', ...,
    'person_id', ..., 'person_name', ...)) FILTER (WHERE p.id IS NOT NULL)``
    aggregate (reference etl/main.py:27-28).
    """
    joined = person_film_work.alias("pfw").join(
        F.broadcast(person.alias("p")),
        F.col("pfw.person_id") == F.col("p.id"),
        "left",
    )
    return (
        joined.groupBy(F.col("pfw.film_work_id").alias("film_work_id"))
        .agg(
            F.array_sort(
                F.collect_set(  # collect_set = DISTINCT; skips NULL structs = FILTER
                    F.when(
                        F.col("p.id").isNotNull(),
                        F.struct(
                            F.col("pfw.role").alias("person_role"),
                            F.col("p.id").alias("person_id"),
                            F.col("p.full_name").alias("person_name"),
                        ),
                    )
                )
            ).alias("persons"),
            F.max(F.col("p.modified")).alias("p_modified"),
        )
    )


def _genres_per_film(genre_film_work: DataFrame, genre: DataFrame) -> DataFrame:
    """Per-film distinct genre names (reference etl/main.py:29
    ``array_agg(DISTINCT g.name)``)."""
    joined = genre_film_work.alias("gfw").join(
        F.broadcast(genre.alias("g")),
        F.col("gfw.genre_id") == F.col("g.id"),
        "left",
    )
    return (
        joined.groupBy(F.col("gfw.film_work_id").alias("film_work_id"))
        .agg(
            F.array_sort(F.collect_set(F.col("g.name"))).alias("genres"),
            F.max(F.col("g.modified")).alias("g_modified"),
        )
    )


def film_changeset(
    film_work: DataFrame,
    genre: DataFrame,
    person: DataFrame,
    genre_film_work: DataFrame,
    person_film_work: DataFrame,
) -> DataFrame:
    """The movies denormalization query (reference etl/main.py:24-38):
    one row per film with `persons` struct array, `genres` name array, and
    ``modified = greatest(fw.modified, max(p.modified), max(g.modified))``
    (reference etl/main.py:26 — the change-version of the derived row).

    Columns: id, title, description, rating, type, modified, persons, genres.
    """
    per_film_persons = _persons_per_film(person_film_work, person)
    per_film_genres = _genres_per_film(genre_film_work, genre)

    fw = film_work.alias("fw")
    out = (
        fw.join(
            per_film_persons.alias("pp"),
            F.col("fw.id") == F.col("pp.film_work_id"),
            "left",
        )
        .join(
            per_film_genres.alias("gg"),
            F.col("fw.id") == F.col("gg.film_work_id"),
            "left",
        )
        .select(
            F.col("fw.id").alias("id"),
            F.col("fw.title").alias("title"),
            F.col("fw.description").alias("description"),
            F.col("fw.rating").alias("rating"),
            F.col("fw.type").alias("type"),
            F.greatest(
                F.col("fw.modified"), F.col("pp.p_modified"), F.col("gg.g_modified")
            ).alias("modified"),
            F.coalesce(F.col("pp.persons"), F.array()).alias("persons"),
            F.coalesce(F.col("gg.genres"), F.array()).alias("genres"),
        )
    )
    return out


def _role_names(role: str):
    """`[p.person_name for p in persons if p.person_role in {role, CODE}]`
    as a higher-order filter+transform (reference etl/main.py:77-86)."""
    long_name, code = ROLE_SYNONYMS[role]
    filtered = F.filter(
        F.col("persons"),
        lambda p: (p["person_role"] == long_name) | (p["person_role"] == code),
    )
    return filtered


def movie_docs(changeset: DataFrame) -> DataFrame:
    """Shape the film changeset into the movies index doc
    (reference index_prep_movie, etl/main.py:67-90; mapping
    es_movies.json:44-105).

    Asymmetry preserved: `director` is ','-joined (NO space, reference
    etl/main.py:77) while actors/writers stay arrays.
    """
    directors = _role_names("director")
    actors = _role_names("actor")
    writers = _role_names("writer")
    as_name = lambda arr: F.transform(arr, lambda p: p["person_name"])  # noqa: E731
    as_ref = lambda arr: F.transform(  # noqa: E731
        arr,
        lambda p: F.struct(
            p["person_id"].alias("id"), p["person_name"].alias("name")
        ),
    )
    return changeset.select(
        F.col("id"),
        F.col("rating").alias("imdb_rating"),
        F.col("genres").alias("genre"),
        F.col("title"),
        F.col("description"),
        F.concat_ws(",", as_name(directors)).alias("director"),
        as_name(actors).alias("actors_names"),
        as_name(writers).alias("writers_names"),
        as_ref(actors).alias("actors"),
        as_ref(writers).alias("writers"),
        F.col("modified"),
    )


def genre_docs(
    genre: DataFrame, genre_film_work: DataFrame, film_work: DataFrame
) -> DataFrame:
    """Genres index doc (reference etl/main.py:40-49 + index_prep_genre
    :93-105): per-genre distinct film-id array.

    The reference round-trips through ``STRING_AGG(..., ', ')`` then
    ``.split(', ')`` (etl/main.py:42,101) — and would crash on a genre
    with zero films (NULL aggregate). We keep the typed array and define
    the empty case as ``[]`` (FIXTURES.md edge 6).
    """
    joined = genre.alias("g").join(
        genre_film_work.alias("gfw"),
        F.col("gfw.genre_id") == F.col("g.id"),
        "left",
    )
    return (
        joined.groupBy("g.id", "g.name", "g.description", "g.modified")
        .agg(
            F.coalesce(
                F.array_sort(F.collect_set(F.col("gfw.film_work_id"))), F.array()
            ).alias("film_ids")
        )
        .select(
            F.col("id"),
            F.col("name"),
            F.col("description"),
            F.col("film_ids"),
            F.col("modified"),
        )
    )


def person_docs(person: DataFrame, person_film_work: DataFrame) -> DataFrame:
    """Persons index doc (reference etl/main.py:51-60 + index_prep_person
    :108-119): per-person array of {film_id, role} structs.

    The reference's join to film_work is vestigial (no fw columns used,
    SURVEY §2.3 J6) — dropped here; row counts are unchanged because
    film_work_id is NOT NULL.
    """
    joined = person.alias("p").join(
        person_film_work.alias("pfw"),
        F.col("pfw.person_id") == F.col("p.id"),
        "left",
    )
    return (
        joined.groupBy("p.id", "p.full_name", "p.modified")
        .agg(
            F.coalesce(
                F.array_sort(
                    F.collect_set(
                        F.when(
                            F.col("pfw.film_work_id").isNotNull(),
                            F.struct(
                                F.col("pfw.film_work_id").alias("film_id"),
                                F.col("pfw.role").alias("role"),
                            ),
                        )
                    )
                ),
                F.array(),
            ).alias("films")
        )
        .select(
            F.col("id"), F.col("full_name"), F.col("films"), F.col("modified")
        )
    )
