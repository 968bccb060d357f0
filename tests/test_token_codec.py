"""Packed-binary token codecs (VERDICT r5 next-step 4).

Pins: byte-exact roundtrips for both codecs across nulls / empties /
boundary values, loud rejection of out-of-domain ids, the measured
payload sizes (u16 = 2 B/token, varint ≤ 3 B/token on a 50k vocab),
and end-to-end replay parity: a u16-codec warehouse replays the same
stream to the same logical state as an array-codec warehouse, with the
target column actually BinaryType and the codec recorded in the table
properties.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from stellar_ledger_data_indexer_spark.functions.token_codec import (
    decode_tokens, encode_tokens)
from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
from stellar_ledger_data_indexer_spark.sources.change_stream import (
    StreamSpec, write_change_events)

BOUNDARY = [0, 1, 127, 128, 16383, 16384, 65535]


def _roundtrip(spark, rows, codec):
    df = spark.createDataFrame(rows, "id long, tokens array<int>") \
        .repartition(3)
    dec = df.select(
        "id", "tokens",
        decode_tokens(encode_tokens(F.col("tokens"), codec), codec)
        .alias("t"))
    bad = dec.filter(
        (F.col("tokens").isNull() != F.col("t").isNull())
        | (F.col("tokens").isNotNull()
           & (F.coalesce(F.col("tokens"), F.array())
              != F.coalesce(F.col("t"), F.array())))).count()
    assert bad == 0, codec


@pytest.mark.parametrize("codec", ["u16", "varint"])
def test_codec_roundtrip(spark, codec):
    rng = np.random.RandomState(7)
    rows = [(0, None), (1, []), (2, BOUNDARY)]
    rows += [(10 + i,
              rng.randint(0, 50257, rng.randint(1, 90)).astype(int).tolist())
             for i in range(200)]
    _roundtrip(spark, rows, codec)


def test_varint_full_int32_range(spark):
    _roundtrip(spark, [(0, [2**31 - 1, 2**21, 2**21 - 1, 2**28, 0])],
               "varint")


def test_codec_rejects_out_of_domain(spark):
    df = spark.createDataFrame([(1, [70000])], "id long, tokens array<int>")
    with pytest.raises(Exception, match="outside"):
        df.select(encode_tokens(F.col("tokens"), "u16")).collect()
    df2 = spark.createDataFrame([(1, [-1])], "id long, tokens array<int>")
    with pytest.raises(Exception, match="negative"):
        df2.select(encode_tokens(F.col("tokens"), "varint")).collect()
    with pytest.raises(ValueError, match="unknown token codec"):
        encode_tokens(F.col("tokens"), "zstd")


def test_codec_payload_sizes(spark):
    rng = np.random.RandomState(11)
    rows = [(i, rng.randint(0, 50257, 64).astype(int).tolist())
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    for codec, bound in (("u16", 2.0), ("varint", 3.0)):
        sz = df.select(F.sum(F.length(
            encode_tokens(F.col("tokens"), codec)))).collect()[0][0]
        assert sz / (100 * 64) <= bound + 1e-9, codec


def test_auto_codec_resolution(spark, tmp_path):
    """tokens_codec='auto' (the default, VERDICT r6 next-step 6): a
    source whose parquet footer stats prove the vocabulary fits 16 bits
    resolves to u16 at warehouse creation; a source with an oversized id
    resolves to array; reopening an existing warehouse always follows
    the PINNED property regardless of the configured codec."""
    from stellar_ledger_data_indexer_spark.functions.token_codec import \
        probe_u16_eligible
    ev = str(tmp_path / "events")
    spec = StreamSpec(n_events=3000, n_docs=300, events_per_seq=100,
                      tok_len_min=4, tok_len_max=16)
    write_change_events(spark, ev, spec, partitions=2)
    assert probe_u16_eligible(ev)
    job = IngestJob(spark, JobConfig(
        events_path=ev, warehouse=str(tmp_path / "wh_auto"),
        num_buckets=4, epoch_size=50))
    assert job.tokens_codec == "u16"
    assert job.target.properties.get("tokens_codec") == "u16"
    job.run(start=2, end=0, backfill=True)
    assert job.target.refresh().schema()["tokens"].dataType.typeName() \
        == "binary"

    # reopen with a conflicting config: the pinned property wins
    job2 = IngestJob(spark, JobConfig(
        events_path=ev, warehouse=str(tmp_path / "wh_auto"),
        num_buckets=4, epoch_size=50, tokens_codec="array"))
    assert job2.tokens_codec == "u16"

    # an out-of-range vocabulary falls back to array
    ev_big = str(tmp_path / "events_big")
    spec_big = StreamSpec(n_events=2000, n_docs=200, events_per_seq=100,
                          tok_len_min=4, tok_len_max=16, vocab=90000)
    write_change_events(spark, ev_big, spec_big, partitions=2)
    assert not probe_u16_eligible(ev_big)
    job3 = IngestJob(spark, JobConfig(
        events_path=ev_big, warehouse=str(tmp_path / "wh_auto_big"),
        num_buckets=4, epoch_size=50))
    assert job3.tokens_codec == "array"


def test_replay_parity_u16_vs_array(spark, tmp_path):
    """Same stream, two warehouses (array vs u16): decoded u16 state ==
    array state row for row; the packed column is BinaryType on disk
    and the codec is recorded in the target's properties."""
    ev = str(tmp_path / "events")
    spec = StreamSpec(n_events=6000, n_docs=500, events_per_seq=150,
                      tok_len_min=4, tok_len_max=32)
    write_change_events(spark, ev, spec, partitions=4)

    jobs = {}
    for codec in ("array", "u16"):
        job = IngestJob(spark, JobConfig(
            events_path=ev, warehouse=str(tmp_path / f"wh_{codec}"),
            num_buckets=8, epoch_size=20, tokens_codec=codec))
        job.run(start=2, end=0, backfill=True)
        jobs[codec] = job

    t_packed = jobs["u16"].target.refresh()
    assert t_packed.properties.get("tokens_codec") == "u16"
    assert t_packed.schema()["tokens"].dataType.typeName() == "binary"

    cols = ["doc_id", "seq", "pos", "deleted", "n_tok"]
    plain = jobs["array"].target.read(spark).select(
        *cols, F.col("tokens").alias("toks"))
    packed = t_packed.read(spark).select(
        *cols, decode_tokens(F.col("tokens"), "u16").alias("toks"))
    def frozen(df):
        return {(r[0], r[1], r[2], r[3], r[4],
                 tuple(r[5]) if r[5] is not None else None)
                for r in df.collect()}
    a, b = frozen(plain), frozen(packed)
    assert a == b and a
