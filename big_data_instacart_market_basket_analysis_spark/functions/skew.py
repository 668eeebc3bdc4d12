"""Skew-mitigation helpers: salted two-stage aggregation.

AQE's skew-join splitting handles skewed *joins*; a skewed *aggregation*
key (one user generating 1% of a 100 TB event stream) still funnels into
a single reducer under a plain groupBy. The standard fix is salting:

  stage 1: groupBy(key, salt = crc32(row-id) % N)  -- partial, N-way fan-out
  stage 2: groupBy(key)                            -- combine partials

Spark's partial aggregation already does map-side combining, but the
*reduce* side of stage-less groupBy still keys on the hot value alone;
salting bounds any single task at 1/N of the hot key's rows. Both
stages stay associative (count/sum/min/max), so the result is exactly
the direct groupBy — which is what the DuckDB oracle checks.

The salt must be deterministic per-row (never rand()): re-computed
under task retries, a random salt double-counts rows on speculative
re-execution. Here it derives from a unique row id via crc32.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALTS = 8


def salt_col(row_id: Column, n_salts: int = N_SALTS) -> Column:
    """Deterministic salt in [0, n_salts) from a unique row id."""
    return F.crc32(row_id.cast("string")) % n_salts


def salted_sum_count(
    df: DataFrame,
    key: str,
    row_id: str,
    value: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage salted aggregation: per-key count(*) + sum(value).

    Output matches ``df.groupBy(key).agg(count, sum)`` exactly —
    associativity is the whole trick. Shuffle 1 keys on (key, salt):
    the hot key spreads over n_salts reducers; shuffle 2 moves only
    n_salts rows per key.
    """
    stage1 = (
        df.withColumn("_salt", salt_col(F.col(row_id), n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(value).alias("_s"),
        )
    )
    return stage1.groupBy(key).agg(
        F.sum("_n").alias("n_events"),
        F.sum("_s").alias("sum_value"),
    )


def salted_skew_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    row_id: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    When the dim side is too large to broadcast and the fact side's
    join key skews (one hot user in a 100 TB event table), sort-merge
    partitions by key alone and the hot key's rows pile into one task.
    Salting bounds that task at 1/n_salts of the hot key: the fact row
    gets a deterministic salt from its unique row id, the dim side is
    replicated once per salt value (explode of a literal range — dim
    grows n_salts-fold, which is the price and why n_salts stays
    small), and the join keys on (key, salt). Row-for-row identical to
    the plain join; AQE's skew splitting composes with it for any
    residual imbalance.
    """
    salted_big = big.withColumn(
        "_salt", salt_col(F.col(row_id), n_salts)
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = salted_big.join(
        salted_dim,
        (salted_big[big_key] == salted_dim[dim_key])
        & (salted_big["_salt"] == salted_dim["_salt"]),
    )
    return joined.drop(salted_dim["_salt"]).drop(
        salted_big["_salt"]
    )
