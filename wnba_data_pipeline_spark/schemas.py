"""Canonical StructTypes for the reference's fixed raw DDL (SURVEY §1).

The reference declares explicit DDL only for the raw layer: the 28-column
player box table (``ingest_nba_daily.py:107-138``, WNBA twin
``ingest_wnba_daily.py:92-124``) and the 8-column team table
(``ingest_wnba_daily.py:136-149``). Everything downstream is schema-on-write.

Deliberate deviations from the reference (G4 latent bugs we must NOT copy,
each recorded here):
- ``MINUTES_PLAYED`` is DOUBLE, not VARCHAR: the reference declares VARCHAR
  (``ingest_nba_daily.py:115``) but sums it numerically
  (``transform_player_stats.py:44``).
- ``created_at`` exists for BOTH leagues: the reference's WNBA fetch omits
  it while NBA adds it (``ingest_wnba_daily.py:46-51`` vs
  ``ingest_nba_daily.py:71-73``); sinks here write by NAME, so the column
  can never be positionally misaligned (A6 fragility).
- percentages are DOUBLE rather than DECIMAL: every computed metric in the
  reference is float64 pandas anyway (§1 "Types used").
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, t, nullable: bool = True) -> StructField:
    return StructField(name, t, nullable)


PLAYER_BOX_SCHEMA = StructType(
    [
        _f("PLAYER_ID", IntegerType()),
        _f("PLAYER_NAME", StringType()),
        _f("TEAM_ID", IntegerType()),
        _f("TEAM_NAME", StringType()),
        _f("GAME_ID", StringType()),
        _f("GAME_DATE", DateType()),
        _f("MINUTES_PLAYED", DoubleType()),  # G4: reference says VARCHAR, sums it
        _f("FIELD_GOALS_MADE", IntegerType()),
        _f("FIELD_GOALS_ATTEMPTED", IntegerType()),
        _f("FIELD_GOAL_PERCENTAGE", DoubleType()),
        _f("THREE_POINTS_MADE", IntegerType()),
        _f("THREE_POINTS_ATTEMPTED", IntegerType()),
        _f("THREE_POINT_PERCENTAGE", DoubleType()),
        _f("FREE_THROWS_MADE", IntegerType()),
        _f("FREE_THROWS_ATTEMPTED", IntegerType()),
        _f("FREE_THROW_PERCENTAGE", DoubleType()),
        _f("OFFENSIVE_REBOUNDS", IntegerType()),
        _f("DEFENSIVE_REBOUNDS", IntegerType()),
        _f("REBOUNDS", IntegerType()),
        _f("ASSISTS", IntegerType()),
        _f("STEALS", IntegerType()),
        _f("BLOCKS", IntegerType()),
        _f("TURNOVERS", IntegerType()),
        _f("PERSONAL_FOULS", IntegerType()),
        _f("POINTS", IntegerType()),
        _f("PLUS_MINUS", DoubleType()),
        _f("league", StringType()),
        _f("created_at", TimestampType()),  # G4: both leagues, injected as-of
    ]
)

TEAM_DAILY_SCHEMA = StructType(
    [
        _f("TEAM_ID", IntegerType()),
        _f("TEAM_NAME", StringType()),
        _f("TEAM_CITY", StringType()),
        _f("TEAM_ABBREVIATION", StringType()),
        _f("CONFERENCE", StringType()),
        _f("GAME_DATE", DateType()),
        _f("league", StringType()),
        _f("created_at", TimestampType()),
    ]
)

RAW_PARTITION_COLS = ("GAME_DATE", "league")  # 100 TB layout: date + league pruning
