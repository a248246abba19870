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


def test_boxscore_fanout_retries_transient_failures(spark, tmp_path):
    """The reference's retries=3 task policy (``ingest_nba_daily.py:22``):
    a game whose fetch fails twice then succeeds must land its rows, and a
    game that fails every attempt is still skipped. The stub counts
    attempts in files (the fetcher runs in executor workers — in-memory
    counters would not cross the process boundary)."""
    import os

    counter_dir = str(tmp_path)

    def flaky(game_id: str) -> list[dict]:
        path = os.path.join(counter_dir, game_id.replace("/", "_"))
        n_prior = os.path.getsize(path) if os.path.exists(path) else 0
        with open(path, "ab") as f:
            f.write(b"x")
        if game_id.endswith("g1"):
            raise RuntimeError("permanent failure")
        if n_prior < 2:
            raise RuntimeError("transient failure")  # attempts 1 and 2
        return [{"game_id": game_id, "player_id": 1, "points": 7}]

    ids = ingest.scoreboard_source(spark, _scoreboard, ["2024-01-01"]).repartition(3)
    box = ingest.boxscore_fanout(
        ids, flaky, "game_id string, player_id int, points int", retries=3
    )
    got = sorted(r["game_id"] for r in box.collect())
    # g0/g2 succeeded on the third attempt; g1 exhausted its retries
    assert got == ["2024-01-01-g0", "2024-01-01-g2"]
    sizes = {f: os.path.getsize(os.path.join(counter_dir, f)) for f in os.listdir(counter_dir)}
    assert sizes == {"2024-01-01-g0": 3, "2024-01-01-g1": 3, "2024-01-01-g2": 3}


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
