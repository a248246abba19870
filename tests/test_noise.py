"""Statistical check for the hash-based Box-Muller noise (SURVEY H8/G5):
beyond the exact oracle parity (tested in test_oracle_parity), the noise
must actually BE standard normal — mean ≈ 0, std ≈ 1 — over the 15k
orders at sf0.01."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import relational

from .conftest import SF_ORACLE


def test_noise_moments(spark):
    # seeded_noise rotated off the capped registry in round 6 (hash parity
    # kept in test_offregistry_parity.py); call the operator directly.
    df = relational.q_seeded_noise(spark, SF_ORACLE)
    row = df.agg(
        F.avg("noise_z").alias("mean"),
        F.stddev_samp("noise_z").alias("std"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # mean of n std-normals has std 1/sqrt(n); allow 5 sigma
    assert abs(row["mean"]) < 5.0 / math.sqrt(row["n"])
    assert abs(row["std"] - 1.0) < 0.05
