"""Document chunking + sequence packing (operators/chunking.py):
exact chunk boundaries, partial tails, empty docs, greedy-by-start
bin assignment, per-stream independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.operators.chunking import (
    chunk_documents,
    pack_chunks,
)


@pytest.fixture(scope="module")
def docs(spark):
    def words(n: int, tag: str) -> str:
        return " ".join(f"{tag}{i}" for i in range(n))

    return spark.createDataFrame(
        [
            (0, "a", words(7, "x")),    # 3 chunks of 3: 3+3+1
            (1, "a", words(3, "y")),    # exactly one full chunk
            (2, "a", "   "),            # whitespace-only: no chunks
            (3, "b", words(4, "z")),    # other stream: 3+1
            (4, "a", ""),               # empty: no chunks
        ],
        ["doc_id", "source", "text"],
    )


def test_chunk_boundaries_exact(spark, docs):
    out = chunk_documents(
        docs, id_cols=("doc_id", "source"), chunk_tokens=3
    ).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_tok"], r["chunk_text"]) for r in out}
    assert got == {
        (0, 0): (3, "x0 x1 x2"),
        (0, 1): (3, "x3 x4 x5"),
        (0, 2): (1, "x6"),
        (1, 0): (3, "y0 y1 y2"),
        (3, 0): (3, "z0 z1 z2"),
        (3, 1): (1, "z3"),
    }
    # empty/whitespace docs produce zero rows
    assert not [k for k in got if k[0] in (2, 4)]


def test_pack_greedy_by_start_offset(spark, docs):
    """budget=4, stream 'a' chunk sizes in (doc_id, chunk_id) order:
    3,3,1,3 → exclusive cumsums 0,3,6,7 → bins 0,0,1,1 (a bin may
    overflow by < one chunk; no chunk is split). Stream 'b' packs
    independently from offset 0."""
    ch = chunk_documents(docs, id_cols=("doc_id", "source"), chunk_tokens=3)
    packed = pack_chunks(ch, "source", ["doc_id", "chunk_id"], budget=4)
    got = {
        (r["source"], r["doc_id"], r["chunk_id"]): r["bin_id"]
        for r in packed.collect()
    }
    assert got == {
        ("a", 0, 0): 0,
        ("a", 0, 1): 0,
        ("a", 0, 2): 1,
        ("a", 1, 0): 1,
        ("b", 3, 0): 0,
        ("b", 3, 1): 0,
    }


def test_pack_bins_hold_budget_except_atomic_overflow(spark):
    """Property at realistic scale: within every bin, the tokens
    BEFORE its last chunk are < budget (the last chunk may overflow
    atomically) — i.e. no bin was closed early and none splits a
    chunk."""
    rows = [(i, "s", " ".join("w" * 1 for _ in range(1 + (i * 7) % 23)))
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    ch = chunk_documents(docs, id_cols=("doc_id", "source"), chunk_tokens=10)
    packed = pack_chunks(ch, "source", ["doc_id", "chunk_id"], budget=32)
    agg = (
        packed.groupBy("source", "bin_id")
        .agg(
            F.sum("n_tok").alias("total"),
            F.max_by("n_tok", F.struct("doc_id", "chunk_id")).alias("last_tok"),
        )
        .collect()
    )
    assert agg
    for r in agg:
        assert r["total"] - r["last_tok"] < 32, r
    # bins are contiguous 0..max per stream
    bins = sorted(r["bin_id"] for r in agg)
    assert bins == list(range(len(bins)))


def test_chunking_validates_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    ch = chunk_documents(docs, id_cols=("doc_id", "source"))
    with pytest.raises(ValueError):
        pack_chunks(ch, "source", ["doc_id", "chunk_id"], budget=0)


def test_chunking_runs_unchanged_under_readstream(spark, docs, tmp_path):
    """chunk_documents is stateless (select + explode), so the SAME
    operator code runs under readStream in append mode — pinned equal
    to batch. (pack_chunks is window-based and batch-only by design:
    streaming packing would need a stateful running-offset operator.)"""
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    ch = chunk_documents(stream, id_cols=("doc_id", "source"), chunk_tokens=3)
    q = (
        ch.writeStream.format("memory").queryName("chunks_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_id"], r["n_tok"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM chunks_stream_test").collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["n_tok"], r["chunk_text"])
        for r in chunk_documents(
            docs, id_cols=("doc_id", "source"), chunk_tokens=3
        ).collect()
    }
    assert got == want and got
