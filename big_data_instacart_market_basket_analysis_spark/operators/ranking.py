"""[EXT] Distributed global-rank kernel — total-order row_number,
running sums, and exact ntile WITHOUT a single-partition sort.

The reference never ranks anything bigger than a pandas frame; at
100 TB "rank every user" is the canonical driver-style bottleneck:
``Window.orderBy(...)`` with no partition key funnels the whole table
through ONE task (Spark warns ``WindowExec: No Partition Defined``).
This kernel is the scale-safe replacement, generalizing the
prefix-sum-rank trick from ``dedup.sorted_neighborhood_pairs``:

1. ``repartitionByRange`` on the order key — the range exchange is a
   real shuffle across ALL executors, and partition i holds keys
   strictly below partition i+1's (Spark's RangePartitioner samples
   boundaries; correctness never depends on where they land because
   the order key is made total by a unique tiebreaker).
2. Partition-local ``row_number`` / running ``sum`` via a window
   PARTITIONED BY ``spark_partition_id()`` — embarrassingly parallel.
3. Per-partition (count, sum) roll-up — a table bounded by the
   shuffle-partition count — packed into ONE struct-array row and
   prefix-summed with array higher-order functions (no WindowExec at
   all, so the `global-window` lint rule reads 0 on every consumer),
   then broadcast-joined back. Global rank = offset + local rank;
   global running sum = sum-offset + local running sum.

Consistency note: the per-partition stats and the final join both
read the SAME range exchange; Spark's ReuseExchange dedupes it inside
one plan, so the partition ids seen by the two sides cannot diverge.

Exactness: ranks are integers; running sums are exact when the summed
column is integral (all call sites sum BIGINT counts/cents per the
repo float rule). ``ntile``/``percent_rank``/``cume_dist`` derive
from (rank, n_total) in closed form — identical to the SQL window
functions whenever the order key is unique (every call site
tie-breaks on a key column), which is what makes the DuckDB oracles
hash-match unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: shuffle width of the range exchange. 32 matches the test harness;
#: at 100 TB raise it with the cluster (it only bounds the offsets
#: table, whose prefix-sum window is #partitions rows by construction).
RANK_PARTITIONS = 32

_RK = "_rk"
_NT = "_n_total"


def global_ranked(
    df: DataFrame,
    order_cols: Sequence[Column],
    sum_cols: Sequence[str] = (),
    num_partitions: int = RANK_PARTITIONS,
) -> DataFrame:
    """Attach a 1-based global ``_rk`` (row_number over the total
    order), ``_n_total``, and for each c in ``sum_cols`` an INCLUSIVE
    running sum ``_run_{c}`` — all computed with bounded per-task
    state (see module docstring). ``order_cols`` must be a total
    order (include a unique tiebreaker) for ranks to be well-defined.
    """
    part = df.repartitionByRange(
        num_partitions, *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    loc = part.withColumn("_lrk", F.row_number().over(wloc))
    for c in sum_cols:
        loc = loc.withColumn(f"_lrun_{c}", F.sum(c).over(wloc))

    stats = loc.groupBy("_pid").agg(
        F.count("*").alias("_pn"),
        *[F.sum(c).cast("long").alias(f"_psum_{c}") for c in sum_cols],
    )
    # prefix-sum the #partitions-row stats table with array
    # higher-order functions on ONE packed row — not a window — so
    # the whole kernel plan contains ZERO unpartitioned WindowExec
    # nodes (the `global-window` lint rule stays at 0 by construction,
    # not by whitelist). O(P^2) slice-sums on P <= num_partitions
    # elements, executor-side, trivially bounded.
    packed = stats.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_pid"),
                    F.col("_pn"),
                    *[F.col(f"_psum_{c}") for c in sum_cols],
                )
            )
        ).alias("_ps")
    )

    def _prefix(field):
        zero = F.lit(0).cast("long")
        return lambda x, i: F.aggregate(
            F.slice(F.col("_ps"), F.lit(1), i),
            zero,
            lambda acc, y: acc + y[field],
        )

    total = F.aggregate(
        F.col("_ps"),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y["_pn"],
    )
    offs = (
        packed.select(
            F.explode(
                F.transform(
                    F.col("_ps"),
                    lambda x, i: F.struct(
                        x["_pid"].alias("_pid"),
                        _prefix("_pn")(x, i).alias("_off"),
                        *[
                            _prefix(f"_psum_{c}")(x, i).alias(
                                f"_soff_{c}"
                            )
                            for c in sum_cols
                        ],
                    ),
                )
            ).alias("_o"),
            total.alias(_NT),
        )
        .select("_o.*", _NT)
    )
    out = loc.join(F.broadcast(offs), "_pid").withColumn(
        _RK, (F.col("_off") + F.col("_lrk")).cast("long")
    )
    drop = ["_pid", "_lrk", "_off"]
    for c in sum_cols:
        out = out.withColumn(
            f"_run_{c}", F.col(f"_soff_{c}") + F.col(f"_lrun_{c}")
        )
        drop += [f"_lrun_{c}", f"_soff_{c}"]
    return out.drop(*drop)


def bucket_prefix_offsets(
    btot: DataFrame,
    bucket_col: str,
    value_cols: Sequence[str],
    descending: bool = False,
) -> DataFrame:
    """EXCLUSIVE prefix sums over a bucket-grain table with ZERO
    WindowExec: pack the (bounded) bucket rows into one sorted
    struct-array, prefix-sum with array higher-order functions, and
    explode back — the same machinery as ``global_ranked``'s offsets
    stage, factored out for the floor-bucket rank family
    (``nb_pr_curve``, ``nb_quality_auc``, ``nb_gains_table``, ...).

    Input must be BUCKET GRAIN (one row per bucket, counts already
    aggregated) — the collect_list is bounded by #buckets, which every
    call site bounds by construction (integer floor of a score whose
    range is data-independent). Returns one row per bucket with
    ``_off_{c}`` = sum of c over all buckets strictly BEFORE this one
    in the (a|de)scending bucket order. O(B^2) slice-sums on B bucket
    elements, executor-side.
    """
    packed = btot.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(bucket_col),
                    *[F.col(c).cast("long").alias(c) for c in value_cols],
                )
            ),
            asc=not descending,
        ).alias("_bs")
    )

    def _prefix(field):
        return lambda x, i: F.aggregate(
            F.slice(F.col("_bs"), F.lit(1), i),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y[field],
        )

    return packed.select(
        F.explode(
            F.transform(
                F.col("_bs"),
                lambda x, i: F.struct(
                    x[bucket_col].alias(bucket_col),
                    *[
                        _prefix(c)(x, i).alias(f"_off_{c}")
                        for c in value_cols
                    ],
                ),
            )
        ).alias("_o")
    ).select("_o.*")


def ntile_expr(k: int, rk: Column, n: Column) -> Column:
    """Exact SQL ``ntile(k)`` from a global row_number ``rk`` (1-based)
    and total count ``n``: the first n % k tiles get floor(n/k)+1 rows,
    the rest floor(n/k) — INTEGRAL division throughout (SQL ``div``,
    never a double divide-then-cast), so the identity holds for any
    BIGINT count, not just below 2^53."""

    def _idiv(a: Column, b: Column) -> Column:
        # all operands here are nonnegative, so truncating `div`
        # equals floor division
        return F.call_function("div", a.cast("long"), b.cast("long"))

    fat = _idiv(n, F.lit(k)) + 1  # floor(n/k)+1 rows per fat tile
    thin = _idiv(n, F.lit(k))
    big = (n % k) * fat  # rows covered by the n%k fat tiles
    return (
        F.when(rk <= big, _idiv(rk + fat - 1, fat))
        .otherwise(
            (n % k)
            + F.when(
                thin > 0, _idiv(rk - big + thin - 1, thin)
            ).otherwise(F.lit(0))
        )
        .cast("int")
    )


def percent_rank_expr(rk: Column, n: Column) -> Column:
    """SQL ``percent_rank`` = (rank-1)/(n-1) for a UNIQUE order key
    (rank == row_number, no peers); 0.0 for a single row."""
    return F.when(n > 1, (rk - 1) / (n - 1).cast("double")).otherwise(
        F.lit(0.0)
    )


def cume_dist_expr(rk: Column, n: Column) -> Column:
    """SQL ``cume_dist`` = rk/n for a UNIQUE order key (each row is
    its own peer group)."""
    return rk / n.cast("double")
