"""Structured Streaming session windows (memory-sink smoke) + multimodal
binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.multimodal import attach_media_meta, decode_image, sample_frames
from fs2_data_spark.streaming.sessions import streaming_session_aggregate


def test_streaming_session_aggregate(spark, tmp_path, events):
    src = str(tmp_path / "stream_src")
    events.limit(500).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = streaming_session_aggregate(stream, key="user_id", ts="ts",
                                      gap="30 minutes", watermark="100 days")
    # complete mode: append would withhold sessions not yet past the watermark
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("sess_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sess_out")
    # batch oracle: gap-based sessionization over the same rows
    from fs2_data_spark.operators.sessionize import session_aggregate
    batch = session_aggregate(spark.read.parquet(src), key="user_id", ts="ts",
                              gap_s=1800, value="value")
    assert out.count() == batch.count()
    assert out.agg(F.sum("n_events")).first()[0] == 500


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(10, 10 + 40 + i))) for i in range(6)]
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_attach_media_meta(spark, media):
    out = attach_media_meta(media).collect()
    assert all(r.payload_bytes == 40 + r.media_id for r in out)
    assert len({r.payload_sha for r in out}) == 6


def test_decode_image_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        decode_image(media).collect()


def test_decode_image_fake_is_deterministic(spark, media):
    a = {r.media_id: list(r.features) for r in decode_image(media, fake=True).collect()}
    b = {r.media_id: list(r.features)
         for r in decode_image(media.repartition(3), fake=True).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_sample_frames(spark, media):
    out = sample_frames(media, every_n_bytes=16, max_frames=3).collect()
    assert all(r.frame_no >= 0 and len(r.frame_stub) == 1 for r in out)
    per_media = {}
    for r in out:
        per_media.setdefault(r.media_id, []).append(r.byte_offset)
    assert all(offs == sorted(offs) for offs in per_media.values())


def test_streaming_running_features_matches_batch(spark, events, tmp_path):
    """applyInPandasWithState running features: after draining the stream,
    each key's final (n, sum) must equal the batch aggregate."""
    from fs2_data_spark.streaming.sessions import streaming_running_features
    src = str(tmp_path / "ev_src")
    sub = events.filter(F.col("user_id") < 40).select("user_id", "ts", "value")
    sub.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(sub.schema).parquet(src)
    out = streaming_running_features(stream, watermark="10000 days")
    name = "fs2ds_running_features"
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination(300)
    # update mode: keep the last emitted row per key
    got = {r.user_id: r for r in spark.table(name).collect()}
    exp = {r.user_id: r for r in
           sub.groupBy("user_id").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("value").alias("s")).collect()}
    assert set(got) == set(exp)
    for k, e in exp.items():
        assert got[k].n == e.n
        assert abs(got[k].sum_v - e.s) < 1e-6
