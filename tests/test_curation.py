"""hash_split / pack_sequences: determinism, stability, distribution,
and an exact pandas re-implementation of the packing rule."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from zdb_spark.operators.curation import hash_split, pack_sequences


def _docs(spark, n=5000):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 97 + 5).alias("toks"))


def _py_bucket(salt, ident):
    h = hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()
    return int(h[:8], 16) % 10_000


def test_hash_split_matches_python_md5(spark):
    """The Spark-side conv(md5) bucket equals stdlib md5 — the exact
    portability property the DuckDB oracle relies on."""
    out = hash_split(_docs(spark, 500), "doc_id").toPandas()
    for _, row in out.iterrows():
        b = _py_bucket("v1", row.doc_id)
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert row.split == want, (row.doc_id, b, row.split, want)


def test_hash_split_distribution_and_stability(spark):
    df = _docs(spark)
    a = hash_split(df, "doc_id").toPandas()
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # stable under repartition and across calls
    b = hash_split(df.repartition(13), "doc_id").toPandas()
    pd.testing.assert_frame_equal(a.sort_values("doc_id").reset_index(drop=True),
                                  b.sort_values("doc_id").reset_index(drop=True))
    # different salt re-deals
    c = hash_split(df, "doc_id", salt="v2").toPandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (merged.split_a != merged.split_c).any()


def test_hash_split_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits={"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits={"a": -0.1, "b": 0.5})


def test_pack_sequences_matches_reference(spark):
    """Exact parity with a sequential pandas re-implementation of the
    rule: shard by hashed id, pack in id order, bin = floor((cum-t)/max)."""
    max_tokens, n_shards = 256, 8
    df = _docs(spark, 2000)
    got = (pack_sequences(df, "doc_id", "toks", max_tokens,
                          n_shards=n_shards)
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    pdf = df.toPandas()
    pdf["shard"] = [(_py_bucket("v1", i)) % n_shards for i in pdf.doc_id]
    pdf = pdf.sort_values(["shard", "doc_id"])
    pdf["cum"] = pdf.groupby("shard")["toks"].cumsum()
    pdf["bin"] = ((pdf["cum"] - pdf["toks"]) // max_tokens).astype(int)
    want = pdf.sort_values("doc_id").reset_index(drop=True)

    assert got.shard.tolist() == want.shard.tolist()
    assert got.bin.tolist() == want["bin"].tolist()


def test_pack_sequences_oversize_doc_blocks_bin(spark):
    """A doc with toks > max_tokens advances the cumsum past its bin:
    no LATER doc in the shard shares that bin."""
    rows = [(1, 10), (2, 500), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    out = (pack_sequences(df, "doc_id", "toks", 100, n_shards=1)
           .toPandas().sort_values("doc_id"))
    big_bin = out.loc[out.doc_id == 2, "bin"].iloc[0]
    later = out[out.doc_id > 2]
    assert (later["bin"] > big_bin).all()


def test_pack_sequences_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, 10), "doc_id", "toks", 0)
