"""End-to-end parity with the reference's music example
(core/examples/music.rs:1-228): three relations with nested/optional
types (Option -> nullable, Vec<enum> -> array<string>, Either -> tag+value),
the two golden queries, and stored views updated by later inserts."""

import pytest

from codd_spark import Database, Relation
from pyspark.sql import functions as F


@pytest.fixture()
def music(db):
    # musician: name, band (nullable -- codd Option<String>), instruments
    # (codd Vec<Instrument> -> array<string>)   music.rs:4-17
    db.add_relation("musician", "name STRING, band STRING, instruments ARRAY<STRING>")
    # band: name, genre   music.rs:19-24
    db.add_relation("band", "name STRING, genre STRING")
    # song: title, artist as codd Either<String,String> -> (artist_kind, artist_name)
    # music.rs:26-32
    db.add_relation("song", "title STRING, artist_kind STRING, artist_name STRING")

    db.insert(
        "musician",
        [
            ("John Petrucci", "Dream Theater", ["Guitar"]),
            ("Taylor Swift", None, ["Vocals"]),
            ("Conor Mason", "Nothing But Thieves", ["Vocals", "Guitar"]),
            ("Stevie Wonder", None, ["Vocals", "Piano"]),
            ("Jordan Rudess", "Dream Theater", ["Keyboard"]),
        ],
    )
    db.insert(
        "band",
        [("Dream Theater", "ProgressiveMetal"), ("Nothing But Thieves", "AlternativeRock")],
    )
    db.insert(
        "song",
        [
            ("Pull Me Under", "band", "Dream Theater"),
            ("Impossible", "band", "Nothing But Thieves"),
            ("Superstition", "musician", "Stevie Wonder"),
        ],
    )
    return db


def guitarists_expr():
    # music.rs:148-161: select musicians playing guitar, project name
    return (
        Relation("musician")
        .select(lambda df: F.array_contains(df["instruments"], "Guitar"))
        .project("name")
    )


def dt_members_expr():
    # music.rs:163-175: join musician.band (nullable key!) with band.name,
    # select progressive metal, project musician name
    return (
        Relation("musician")
        .join(
            Relation("band"),
            left_key=["band"],
            right_key=["name"],
            mapper=lambda l, r: [
                l["name"].alias("name"),
                r["genre"].alias("genre"),
            ],
        )
        .select("genre = 'ProgressiveMetal'")
        .project("name")
    )


def test_guitarists(music):
    rows = music.evaluate(guitarists_expr())
    assert [r.name for r in rows] == ["Conor Mason", "John Petrucci"]


def test_dream_theater_members(music):
    rows = music.evaluate(dt_members_expr())
    assert [r.name for r in rows] == ["John Petrucci", "Jordan Rudess"]


def test_null_band_not_joined_to_null_band_name(music):
    # both sides have no NULLs in 'band.name'; musicians with NULL band
    # simply don't match -- but codd's semantics WOULD match None==None if a
    # band row had a NULL name (null-safe join). Verify both directions:
    music.insert("band", [(None, "Unsigned")])
    e = Relation("musician").join(
        Relation("band"), left_key=["band"], right_key=["name"],
        mapper=lambda l, r: [l["name"].alias("name"), r["genre"].alias("genre")],
    )
    rows = music.evaluate(e)
    unsigned = {r.name for r in rows if r.genre == "Unsigned"}
    assert unsigned == {"Taylor Swift", "Stevie Wonder"}


def test_views_update_after_inserts(music):
    # music.rs:177-226: store both views, insert two more musicians, re-check
    v_guitar = music.store_view(guitarists_expr())
    v_dt = music.store_view(dt_members_expr())
    music.insert(
        "musician",
        [
            ("John Myung", "Dream Theater", ["Guitar"]),
            ("Alex Turner", "Arctic Monkeys", ["Vocals", "Guitar"]),
        ],
    )
    assert [r.name for r in music.evaluate(v_guitar.scan())] == [
        "Alex Turner", "Conor Mason", "John Myung", "John Petrucci",
    ]
    assert [r.name for r in music.evaluate(v_dt.scan())] == [
        "John Myung", "John Petrucci", "Jordan Rudess",
    ]


def test_song_artist_either_encoding(music):
    # Either<Musician, Band> handled as tag+value: find songs by bands with
    # a known genre (join through the tagged side)
    e = (
        Relation("song")
        .select("artist_kind = 'band'")
        .join(
            Relation("band"),
            left_key=["artist_name"],
            right_key=["name"],
            mapper=lambda l, r: [l["title"].alias("title"), r["genre"].alias("genre")],
        )
    )
    rows = music.evaluate(e)
    assert [(r.title, r.genre) for r in rows] == [
        ("Impossible", "AlternativeRock"),
        ("Pull Me Under", "ProgressiveMetal"),
    ]
