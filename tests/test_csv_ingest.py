"""Instacart-format CSV ingest parity (SURVEY.md S1-S6).

Exercises the reference's parse rules on hand-written CSV: header strip,
typed projection, eval_set enum encode, days_since ""->0 default, and
the products malformed-row drop + name-column prune.
"""

from __future__ import annotations

import pytest

from big_data_instacart_market_basket_analysis_spark.sources import (
    csv_ingest,
)

ORDERS_CSV = """orderID,userID,eval_set,order_number,order_dow,order_hod,days_since
1,10,prior,1,2,8,
2,10,train,2,3,9,7
3,11,test,1,0,14,
"""

ORDER_PRODUCTS_CSV = """orderID,productID,cart_order,reordered
1,100,1,0
1,101,2,1
2,100,1,1
"""

# row 3 is malformed (non-integer productID) -> DROPMALFORMED removes it
PRODUCTS_CSV = """productID,product_name,aisle_id,dep_id
100,Banana,24,4
101,"Organic Milk, Whole",84,16
oops,Broken Row,x,y
"""


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("instacart_csv")
    files = {}
    for name, body in (
        ("orders", ORDERS_CSV),
        ("order_products", ORDER_PRODUCTS_CSV),
        ("products", PRODUCTS_CSV),
    ):
        p = d / f"{name}.csv"
        p.write_text(body)
        files[name] = str(p)
    return files


def test_read_orders_enum_and_null_default(spark, paths):
    rows = {
        r["orderID"]: r
        for r in csv_ingest.read_orders(spark, paths["orders"]).collect()
    }
    assert len(rows) == 3  # header stripped (S2)
    # S5: prior->0, train->1, test->2
    assert (rows[1]["eval_set"], rows[2]["eval_set"], rows[3]["eval_set"]) \
        == (0, 1, 2)
    # S6: "" -> 0, present value parsed
    assert rows[1]["days_since"] == 0
    assert rows[2]["days_since"] == 7
    # S3: typed at read
    assert rows[1]["userID"] == 10 and isinstance(rows[1]["userID"], int)


def test_read_order_products_typed(spark, paths):
    df = csv_ingest.read_order_products(spark, paths["order_products"])
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "int", "int", "int"
    ]
    assert df.count() == 3


def test_read_products_dropmalformed_and_prune(spark, paths):
    df = csv_ingest.read_products(spark, paths["products"])
    # P1: name column pruned; S4: malformed row dropped
    assert df.columns == ["productID", "aisle_id", "dep_id"]
    got = {r["productID"] for r in df.collect()}
    assert got == {100, 101}
