"""plans/balance.py: driver-side Murmur3 must match Spark's hash
partitioning bit-for-bit, and the LPT gid mapping must realize near-equal
partition loads even with adversarial (heavy-tailed) group weights."""

import random

from pyspark.sql import functions as F

from geojson_vt_spark.plans.balance import (
    balanced_gid_mapping,
    bin_loads,
    lpt_assign,
    partition_of_long,
    spark_hash_long,
)


def test_hash_long_matches_spark(spark):
    vals = [0, 1, -1, 7, 42, 123456789, -987654321, 2**40 + 3, -(2**45) - 11,
            2**63 - 1, -(2**63)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert spark_hash_long(r.v) == r.h, r.v


def test_partition_of_long_matches_repartition(spark):
    """pmod(hash(gid), n) must be the physical partition repartition(n, col)
    sends the row to — the whole premise of engineered placement."""
    n = 7
    vals = list(range(50))
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(n, "v")
    got = (
        df.withColumn("pid", F.spark_partition_id())
        .select("v", "pid")
        .collect()
    )
    for r in got:
        assert partition_of_long(r.v, n) == r.pid, r.v


def test_lpt_balance_heavy_tail():
    rng = random.Random(7)
    # 100 groups, a few giants: the hash-lottery worst case
    weights = [rng.randint(1, 100) for _ in range(90)] + [5000] * 10
    keys = [f"k{i}" for i in range(len(weights))]
    n = 16
    mapping = balanced_gid_mapping(keys, weights, n)
    assert len(set(mapping.values())) == len(keys)  # distinct gids per group
    loads = bin_loads(keys, weights, mapping, n)
    ideal = sum(weights) / n
    assert max(loads) <= 4 / 3 * ideal + max(weights)
    # and strictly: no partition carries two of the giants
    assert max(loads) < 2 * 5000


def test_lpt_assign_is_deterministic():
    w = [3, 1, 4, 1, 5, 9, 2, 6]
    assert lpt_assign(w, 3) == lpt_assign(w, 3)
    m1 = balanced_gid_mapping(list("abcdefgh"), w, 3)
    m2 = balanced_gid_mapping(list("abcdefgh"), w, 3)
    assert m1 == m2
