"""Ingestion-source tests (SURVEY §2 A1-A3) with stub fetchers — the
sandbox has no network; the operator under test is the Spark plumbing
(driver listing → distributed mapInPandas fan-out → union), not HTTP."""

from __future__ import annotations

import pandas as pd

from wnba_data_pipeline_spark.sources import ingest


def _scoreboard(date: str) -> list[str]:
    if date == "2024-01-02":
        return []  # the reference's 404 → [] path
    return [f"{date}-g{i}" for i in range(3)]


def _boxscore(game_id: str) -> list[dict]:
    if game_id.endswith("g1"):
        raise RuntimeError("simulated fetch failure")  # per-game skip
    return [
        {"game_id": game_id, "player_id": p, "points": 10 * p + len(game_id)}
        for p in range(1, 4)
    ]


def test_scoreboard_source(spark):
    df = ingest.scoreboard_source(spark, _scoreboard, ["2024-01-01", "2024-01-02", "2024-01-03"])
    rows = df.collect()
    assert len(rows) == 6  # 3 + 0 (404 day) + 3
    assert {r["game_date"] for r in rows} == {"2024-01-01", "2024-01-03"}


def test_boxscore_fanout_skips_failed_games(spark):
    ids = ingest.scoreboard_source(spark, _scoreboard, ["2024-01-01"]).repartition(3)
    box = ingest.boxscore_fanout(ids, _boxscore, "game_id string, player_id int, points int")
    pdf = box.toPandas().sort_values(["game_id", "player_id"]).reset_index(drop=True)
    # g1 raised and was skipped; g0 and g2 each contribute 3 players
    expected = pd.DataFrame(
        [
            {"game_id": gid, "player_id": p, "points": 10 * p + len(gid)}
            for gid in ("2024-01-01-g0", "2024-01-01-g2")
            for p in range(1, 4)
        ]
    )
    pd.testing.assert_frame_equal(pdf, expected, check_dtype=False)


def test_literal_source(spark):
    rows = [(i, f"Team {i}") for i in range(12)]
    df = ingest.literal_source(spark, rows, "team_id int, team_name string")
    assert df.count() == 12
    assert df.filter("team_id = 5").collect()[0]["team_name"] == "Team 5"


def test_literal_source_canonical_team_schema(spark):
    """The reference's hardcoded 12 WNBA teams (``ingest_wnba_daily.py:60-84``)
    through the canonical fixed DDL (schemas.TEAM_DAILY_SCHEMA)."""
    import datetime

    from wnba_data_pipeline_spark.schemas import TEAM_DAILY_SCHEMA

    as_of = datetime.datetime(2024, 1, 1)
    rows = [
        (i, f"Team {i}", f"City {i}", f"T{i:02d}", "East" if i % 2 else "West",
         datetime.date(2024, 1, 1), "WNBA", as_of)
        for i in range(12)
    ]
    df = ingest.literal_source(spark, rows, TEAM_DAILY_SCHEMA)
    assert df.schema == TEAM_DAILY_SCHEMA
    assert df.count() == 12
    assert df.filter("CONFERENCE = 'East'").count() == 6
