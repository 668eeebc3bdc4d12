"""Custom Python DataSource: partition planning + deterministic rows."""

from __future__ import annotations

from big_data_instacart_market_basket_analysis_spark.sources import (
    pydatasource as pds,
)


def test_partition_planning(spark):
    df = pds.synthetic_docs(spark)
    assert df.rdd.getNumPartitions() == pds.SYNTH_DOCS_PARTITIONS
    assert df.count() == pds.SYNTH_DOCS_N


def test_rows_are_pure_functions_of_doc_id(spark):
    df = pds.synthetic_docs(spark, n=16)
    got = {r.doc_id: r.text for r in df.collect()}
    assert got[0] == " ".join(pds.synth_words(0))
    assert got[15] == " ".join(pds.synth_words(15))
    # word-count rule: 1 + doc_id % 8
    assert len(got[3].split(" ")) == 4
    assert len(got[8].split(" ")) == 1


def test_reader_slices_cover_range_exactly():
    reader = pds.SyntheticDocsReader({"n": "10", "partitions": "3"})
    slices = reader.partitions()
    seen = []
    for s in slices:
        seen.extend(range(s.start, s.end))
    assert seen == list(range(10))


def test_streaming_reader_matches_batch(spark):
    """The custom source's streaming form: micro-batches of doc_ids
    driven to completion must equal the batch read exactly."""
    pds.register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n", "96")
        .option("batch_size", "40")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_pds_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.doc_id, r.text) for r in spark.table("t_pds_stream").collect()
    )
    want = sorted(
        (r.doc_id, r.text)
        for r in pds.synthetic_docs(spark, n=96).collect()
    )
    assert got == want and len(got) == 96


def test_jsonl_sink_roundtrip_and_overwrite(spark, tmp_path):
    """Write -> published part files + _SUCCESS; overwrite replaces
    prior content instead of accumulating; staging dir is gone."""
    import os

    pds.register_sink(spark)
    path = str(tmp_path / "sink")
    os.makedirs(path, exist_ok=True)
    df1 = spark.range(10).selectExpr(
        "id AS doc_id", "concat('a', id) AS text"
    )
    df1.write.format("jsonl_sink").mode("overwrite").option(
        "path", path
    ).save()
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "_staging"))

    back = spark.read.schema("doc_id bigint, text string").json(
        f"{path}/part-*.jsonl"
    )
    assert back.count() == 10

    # overwrite: smaller second write must fully replace the first
    df2 = spark.range(3).selectExpr(
        "id AS doc_id", "concat('b', id) AS text"
    )
    df2.write.format("jsonl_sink").mode("overwrite").option(
        "path", path
    ).save()
    back2 = spark.read.schema("doc_id bigint, text string").json(
        f"{path}/part-*.jsonl"
    )
    rows = sorted((r.doc_id, r.text) for r in back2.collect())
    assert rows == [(0, "b0"), (1, "b1"), (2, "b2")]


def test_jsonl_sink_stragglers_never_publish(spark, tmp_path):
    """Two-phase commit contract: a staged file not named in a commit
    message (a crashed/speculative task's leftover) is invisible to
    readers — only committed part-*.jsonl files publish."""
    import os

    pds.register_sink(spark)
    path = str(tmp_path / "sink2")
    os.makedirs(path, exist_ok=True)
    spark.range(5).selectExpr("id AS doc_id", "'x' AS text").write.format(
        "jsonl_sink"
    ).mode("overwrite").option("path", path).save()

    # simulate a straggler: a staged file that was never committed
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "part-deadbeef.jsonl"), "w") as fh:
        fh.write('{"doc_id": 999, "text": "ghost"}\n')

    back = spark.read.schema("doc_id bigint, text string").json(
        f"{path}/part-*.jsonl"
    )
    assert back.filter("doc_id = 999").count() == 0
    assert back.count() == 5
