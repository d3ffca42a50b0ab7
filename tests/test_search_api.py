"""Search surface + API layer + migration over the movies fixture —
the reference's Postman golden assertions (etl/json/ETLTests-2.json)
re-derived for our synthetic fixture, per SURVEY §5.2.

Golden analogues (counts re-derived, shapes/semantics identical):
1. match-all total == fixture film count           (item 1: 999 docs)
2. query_string "N//A"                             (item 2)
3. fuzzy multi_match "camp" + pinned top hit       (items 3-4)
4. nested actors.name match                        (item 5)
5. term by id → exact writers_names                (item 6)
6. term by id → empty director string              (item 7)
7. terms agg → genre bucket count                  (item 8)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.api import (
    admin_filter,
    admin_search,
    film_detail,
    film_listing,
    paginate,
)
from djangoadmin_postgresql_2_elasticseach_spark.operators.denorm import (
    film_changeset,
    movie_docs,
)
from djangoadmin_postgresql_2_elasticseach_spark.search.query import (
    match_query,
    multi_match_fuzzy,
    term_query,
)
from djangoadmin_postgresql_2_elasticseach_spark.sources.migrate import (
    check_constraints,
    load_migrated,
    migrate,
)
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_movies
from tests import movies_fixtures
from tests.movies_fixtures import _u


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("movies_search"))
    movies_fixtures.build(d)
    return d


@pytest.fixture(scope="module")
def movies(spark, fixture_dir):
    return load_movies(spark, fixture_dir)


@pytest.fixture(scope="module")
def docs(movies):
    return movie_docs(
        film_changeset(
            movies["film_work"],
            movies["genre"],
            movies["person"],
            movies["genre_film_work"],
            movies["person_film_work"],
        )
    ).cache()


def test_match_all_total(docs):
    # golden 1: total document count (reference asserts 999 on its dump)
    assert docs.count() == 10


def test_query_string_slash_token(docs):
    # golden 2: "N//A" query_string — tokenizes to 'n','a'; our fixture
    # plants the literal in exactly one description
    hits = docs.filter(F.col("description").contains("N//A"))
    assert [r["id"] for r in hits.collect()] == [_u("6f", 3)]
    m = match_query(docs, "description", "N//A")
    assert _u("6f", 3) in {r["id"] for r in m.collect()}


def test_fuzzy_multimatch_camp(docs):
    # goldens 3-4: fuzzy multi_match "camp" over title/description/names
    # with relevance ranking; top hit pinned
    res = multi_match_fuzzy(
        docs,
        "camp",
        [("title", 3.0), ("description", 2.0), ("director", 1.0)],
        id_col="id",
        k=10,
    ).collect()
    ids = [r["id"] for r in res]
    # films 1, 2 ("camp" in title+description), 3 ("!Camp the Third"),
    # 7 via director "Greg Camp"; film 4 has no camp connection at all
    assert set(ids) == {_u("6f", 1), _u("6f", 2), _u("6f", 3), _u("6f", 7)}
    assert _u("6f", 4) not in ids
    # top-ranked: film 1 — exact 'camp' in title AND description tokens
    assert ids[0] == _u("6f", 1)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_nested_actor_match(docs):
    # golden 5: nested query on actors.name (reference "Greg Camp" → 6)
    hits = docs.filter(
        F.exists(F.col("actors"), lambda a: a["name"] == "Greg Camp")
    )
    got = {r["id"] for r in hits.collect()}
    assert got == {_u("6f", 1), _u("6f", 2), _u("6f", 5), _u("6f", 8)}


def test_term_by_id_single_writer(docs):
    # golden 6: term query by id → exact writers_names array
    row = term_query(docs, "id", _u("6f", 7)).first()
    assert row["writers_names"] == ["Craig Hutchinson"]


def test_term_by_id_empty_director(docs):
    # golden 7: term query by id → zero-length director string
    row = term_query(docs, "id", _u("6f", 6)).first()
    assert row["director"] == ""


def test_terms_agg_genres(docs):
    # golden 8: terms aggregation over genre (reference: 26 buckets)
    buckets = (
        docs.select(F.explode("genre").alias("g")).groupBy("g").count().collect()
    )
    assert len(buckets) == 4  # Action, Drama, Комедия, Sci-Fi (EmptyGenre absent)
    by_name = {r["g"]: r["count"] for r in buckets}
    assert by_name["Action"] == 4


# ---------------------------------------------------------------------------
# API layer (reference views.py / admin.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def listing(movies):
    return film_listing(
        movies["film_work"],
        movies["genre"],
        movies["person"],
        movies["genre_film_work"],
        movies["person_film_work"],
    ).cache()


def test_film_listing_role_arrays(listing):
    rows = {r["id"]: r for r in listing.collect()}
    multi = rows[_u("6f", 5)]
    assert multi["actors"] == ["Craig Hutchinson", "Greg Camp"]
    assert multi["directors"] == ["Анна Каренина"]
    assert multi["writers"] == ["Bob Camper", "Craig Hutchinson"]
    empty = rows[_u("6f", 4)]
    assert empty["genres"] == [] and empty["actors"] == []


def test_pagination_envelope(listing):
    env = paginate(listing, page=1, page_size=4)
    assert env["count"] == 10 and env["total_pages"] == 3
    assert env["prev"] is None and env["next"] == 2
    assert len(env["results"]) == 4
    titles = [r["title"] for r in env["results"]]
    assert titles == sorted(titles)  # ordered by title
    env3 = paginate(listing, page=3, page_size=4)
    assert env3["next"] is None and env3["prev"] == 2
    assert len(env3["results"]) == 2
    # pages partition the listing: no overlap, full coverage
    all_ids = [
        r["id"]
        for p in (1, 2, 3)
        for r in paginate(listing, page=p, page_size=4)["results"]
    ]
    assert len(all_ids) == 10 and len(set(all_ids)) == 10


def test_detail_icontains(listing):
    # uuid fragment "000000000005" matches film 5's id
    d = film_detail(listing, "000000000005")
    assert d is not None and d["id"] == _u("6f", 5)
    # edge 12: short fragment matching >1 row → first by id order
    d2 = film_detail(listing, "-0000-4000-8000-")
    assert d2["id"] == min(r["id"] for r in listing.select("id").collect())
    assert film_detail(listing, "zzz") is None


def test_admin_search_and_filter(movies):
    fw = movies["film_work"]
    hits = admin_search(fw, "camp", ["title", "description", "id"])
    assert {r["id"] for r in hits.collect()} == {_u("6f", 1), _u("6f", 2), _u("6f", 3)}
    only_tv = admin_filter(fw, type_eq="TV")
    assert [r["id"] for r in only_tv.collect()] == [_u("6f", 3)]


# ---------------------------------------------------------------------------
# Migration (reference load_data.py)
# ---------------------------------------------------------------------------


def test_migrate_and_constraints(spark, movies, tmp_path):
    dest = str(tmp_path / "migrated")
    counts = migrate(spark, movies, dest, mode="overwrite")
    assert counts["film_work"] == 10 and counts["person_film_work"] == 18
    back = load_migrated(spark, dest)
    # row-count parity source vs sink (reference test_rows_num.py:34-53)
    for name, df in back.items():
        assert df.count() == movies[name].count(), name
    # column-name parity (reference test_column_names.py:34-53)
    for name, df in back.items():
        assert df.columns == movies[name].columns, name
    # idempotent re-run adds nothing (ON CONFLICT DO NOTHING semantics)
    again = migrate(spark, movies, dest, mode="append_if_absent")
    assert all(v == 0 for v in again.values()), again
    # constraint checks all clean (reference dataclass + DDL constraints)
    v = check_constraints(back)
    assert all(n == 0 for n in v.values()), v


def test_bm25_ranking_properties(spark):
    """BM25 invariants: more occurrences of a query term rank higher at
    equal length; a rare term outscores a ubiquitous one; non-matching
    docs are excluded."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import bm25_topk

    rows = [
        (1, "spark spark spark pad pad"),
        (2, "spark pad pad pad pad"),
        (3, "pad pad pad pad pad"),
        (4, "rare pad pad pad pad"),
        (5, "spark pad rare pad pad"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, "spark", k=10).collect()
    ids = [r["doc_id"] for r in top]
    assert 3 not in ids and 4 not in ids
    assert ids[0] == 1  # tf dominance at equal dl
    # 'rare' (df=2) carries more idf than 'spark' (df=3): doc 5 (both
    # terms) must beat doc 2 (spark only) on the combined query
    both = {r["doc_id"]: r["score"] for r in bm25_topk(docs, "spark rare", k=10).collect()}
    assert both[5] > both[2]
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_match_phrase_requires_adjacency(spark):
    """Phrase terms must be CONSECUTIVE in the analyzed stream: scattered
    occurrences, reversed order, and sub-phrase prefixes must not match;
    stemming applies to both sides ('tables hashing' ~ 'table hash')."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.query import match_phrase

    docs = spark.createDataFrame(
        [
            (1, "the table hash join"),   # adjacent (stopword dropped)
            (2, "table big hash"),        # scattered -> no
            (3, "hash table"),            # reversed -> no
            (4, "tables hashing"),        # stems align -> yes
            (5, "table"),                 # shorter than phrase -> no
            (6, ""),                      # empty -> no
        ],
        "doc_id long, text string",       # no lang column: API is generic
    )
    got = sorted(r["doc_id"] for r in match_phrase(docs, "text", "table hash").collect())
    assert got == [1, 4]
