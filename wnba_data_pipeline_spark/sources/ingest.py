"""Ingestion sources (SURVEY §2 A1-A3) with injectable fetchers.

The reference ingests via driver-side HTTP: a scoreboard listing
(``ingest_nba_daily.py:22-45``: GET → game ids, 404 → [], task retries),
then one box-score fetch PER GAME in a Python loop with per-game
error-skip and a rate-limit sleep (``ingest_nba_daily.py:48-93``), plus a
literal in-memory source (``ingest_wnba_daily.py:60-84``).

Spark-first shape:
- A1 scoreboard: the listing is one tiny request → fetch on the driver,
  ``spark.createDataFrame`` the ids. No cluster involvement needed for a
  KB-sized payload.
- A2 per-game fan-out: the N requests are the parallel part →
  ``mapInPandas`` over the game-id frame, one fetcher call per id INSIDE
  the executors, per-game try/except skip (the reference's ``continue``,
  ``ingest_nba_daily.py:85-87``). At 100 TB-scale ingest the id frame is
  repartitioned so fetch concurrency = #tasks, and the per-task loop is
  the rate limiter.
- A3 literal rows: ``spark.createDataFrame(rows, schema)``.

Fetchers are plain callables (id → list[dict]) so tests inject stubs — the
sandbox has no network, and the reference's HTTP layer is not the operator
under test (SURVEY §2.A notes the same).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

ScoreboardFetcher = Callable[[str], list[str]]  # date → game ids ([] on 404)
BoxscoreFetcher = Callable[[str], list[dict]]  # game id → player rows (raise = skip game)


def scoreboard_source(spark: SparkSession, fetcher: ScoreboardFetcher, dates: Iterable[str]) -> DataFrame:
    """A1: driver-side scoreboard listing → (game_date, game_id) frame.
    A fetcher returning [] (the reference's 404 path) contributes no rows."""
    rows = [(d, gid) for d in dates for gid in fetcher(d)]
    return spark.createDataFrame(rows, "game_date string, game_id string")


def boxscore_fanout(
    game_ids: DataFrame,
    fetcher: BoxscoreFetcher,
    schema: StructType | str,
    *,
    id_col: str = "game_id",
    retries: int = 3,
    retry_delay_s: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """A2: per-game fan-out fetch as a ``mapInPandas`` adapter. Each executor
    task loops its partition's ids, calling the fetcher once per game with
    bounded retry, and skipping games whose fetch still raises after the
    last attempt — the reference's ``retries=3`` task policy with a fixed
    delay (``ingest_nba_daily.py:22``) plus its try/except-continue
    (``ingest_nba_daily.py:85-87``), both moved into the distributed path.
    ``retry_delay_s`` defaults to 0 (the reference's 5-minute task delay is
    an orchestrator setting, not a per-request one); ``sleep`` is
    injectable so tests assert the backoff without waiting it out."""

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            frames = []
            for gid in batch[id_col]:
                rows = None
                for attempt in range(max(1, retries)):
                    try:
                        rows = fetcher(gid)
                        break
                    except Exception:
                        if attempt + 1 >= max(1, retries):
                            break  # per-game failure tolerance: skip the game
                        if retry_delay_s:
                            sleep(retry_delay_s)
                if rows:
                    frames.append(pd.DataFrame(rows))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return game_ids.mapInPandas(fetch_partition, schema)


def literal_source(spark: SparkSession, rows: list[tuple], schema: StructType | str) -> DataFrame:
    """A3: literal in-memory rows (the reference's hardcoded 12 WNBA teams,
    ``ingest_wnba_daily.py:60-84``)."""
    return spark.createDataFrame(rows, schema)
