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
