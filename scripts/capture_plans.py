"""Dump .explain('formatted') for named queries to plans/$PLANS_ROUND/<q>_<tag>.txt.

Usage: python scripts/capture_plans.py before q1,q2,... [sf_dir]
PLANS_ROUND defaults to r10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_instacart_market_basket_analysis_spark.session import get_spark  # noqa: E402

import __spark_entry__ as e  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = e.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR capturing plan: {ex}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", f"{name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
