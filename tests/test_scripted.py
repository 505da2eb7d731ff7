"""UDF-surface tests (SURVEY.md §2.10): transform shape changes, scalar
record transform, and the external-command pipe."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.operators import (
    execute_stream_command,
    flowfile_transform,
    record_transform,
)


def test_flowfile_transform_one_to_many(spark, sf_dir):
    docs = io.load_table(spark, sf_dir, "documents").select("doc_id").limit(10)

    def split(batch: pd.DataFrame) -> pd.DataFrame:
        # UDTF shape: every input row becomes two fragments
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].repeat(2).to_numpy(),
                "fragment_index": [i for _ in range(len(batch)) for i in (0, 1)],
            }
        )

    out = flowfile_transform(docs, split, "doc_id BIGINT, fragment_index INT")
    assert out.count() == 20
    assert out.groupBy("doc_id").count().filter(F.col("count") != 2).count() == 0


def test_flowfile_transform_filter_shape(spark, sf_dir):
    docs = io.load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def keep_long(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_chars"] > 500]

    out = flowfile_transform(docs, keep_long, "doc_id BIGINT, n_chars BIGINT")
    assert out.count() == docs.filter(F.col("n_chars") > 500).count()


def test_record_transform_scalar(spark, sf_dir):
    docs = io.load_table(spark, sf_dir, "documents")
    out = record_transform(
        docs,
        lambda s: s["text"].str.len().astype("int64"),
        "text_len",
        "bigint",
        cols=["text"],
    )
    mismatch = out.filter(F.col("text_len") != F.length("text")).count()
    assert mismatch == 0


def test_execute_stream_command_rev(spark, sf_dir):
    docs = io.load_table(spark, sf_dir, "documents").select("doc_id", "lang").limit(50)
    out = execute_stream_command(docs, "lang", ["rev"])
    rows = out.select("lang", "stdout").collect()
    assert all(r["stdout"] == r["lang"][::-1] for r in rows)
