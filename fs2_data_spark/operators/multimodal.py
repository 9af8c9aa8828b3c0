"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata struct
(modality, width/height or sample rate, codec). The Spark-side plumbing —
schema, partitioning, Arrow batch shape, UDF signatures — is real and tested;
the codec step itself is STUBBED (no image/audio libraries in this container):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, which
produces a deterministic fake decode so pipelines can be exercised end-to-end.

At scale: binary payloads dominate row size, so operators here use
``mapInPandas`` (iterator of Arrow batches — bounded memory per task,
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls batch bytes) and
never collect or explode payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, codec:string>"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      modality: str = "image") -> DataFrame:
    """Derive cheap metadata (byte length, content hash) JVM-side — no UDF."""
    return df.withColumns({
        "payload_bytes": F.length(F.col(payload_col)).cast("bigint"),
        "payload_sha": F.sha2(F.col(payload_col), 256),
        "modality": F.lit(modality),
    })


def decode_image(df: DataFrame, payload_col: str = "payload", *, fake: bool = False,
                 out_dim: int = 16) -> DataFrame:
    """Decode image bytes -> fixed-size feature vector (array<float>).

    Real decode requires an imaging library (not in this container) -> raises
    ``NotImplementedError``. With ``fake=True`` a deterministic stand-in
    derives ``out_dim`` floats from the payload bytes so the Arrow plumbing,
    schema, and batch shapes are fully exercised and testable.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    cols = df.columns
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"features array<float>"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an imaging library not present "
                    "in this environment; pass fake=True for the deterministic stub")
            feats = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw or b"\x00", dtype=np.uint8)
                # deterministic fake "decode": strided byte means, unit-scaled
                chunks = np.array_split(b, out_dim) if len(b) >= out_dim else [b] * out_dim
                feats.append(np.array([float(c.mean()) / 255.0 if len(c) else 0.0
                                       for c in chunks], dtype=np.float32))
            yield pdf.assign(features=feats)

    return df.mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 4096,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: one output row per
    sampled offset (frame decode itself stubbed as the byte at the offset).
    Pure JVM: sequence + transform + posexplode, no Python."""
    n = F.least(F.lit(max_frames),
                F.greatest((F.length(payload_col) / every_n_bytes).cast("int"), F.lit(1)))
    offsets = F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every_n_bytes + 1)
    return (df.withColumn("__offs", offsets)
            .select(*df.columns, F.posexplode("__offs").alias("frame_no", "byte_offset"))
            .withColumn("frame_stub",
                        F.substring(F.col(payload_col), F.col("byte_offset"), F.lit(1))))


def resize_image(df: DataFrame, payload_col: str = "payload",
                 width: int = 8, height: int = 8, *,
                 fake: bool = False, out_col: str = "resized") -> DataFrame:
    """Resize plumbing: image bytes -> ``width*height``-byte thumbnail
    payload. Real resampling needs an imaging library (absent here) ->
    ``NotImplementedError``; ``fake=True`` takes a deterministic byte-stride
    sample of the payload so schema/batch shapes are real and testable.
    Output stays ``binary`` (thumbnails ride like any other payload)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} binary"])
    n_out = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires an imaging library not present "
                    "in this environment; pass fake=True for the deterministic stub")
            outs = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw or b"\x00", dtype=np.uint8)
                idx = np.linspace(0, len(b) - 1, n_out).astype(np.int64)
                outs.append(b[idx].tobytes())
            yield pdf.assign(**{out_col: outs})

    return df.mapInPandas(kernel, out_schema)


def extract_audio_features(df: DataFrame, payload_col: str = "payload",
                           n_bands: int = 12, *, fake: bool = False,
                           out_col: str = "audio_features") -> DataFrame:
    """Audio feature-extraction plumbing: payload -> ``n_bands`` floats
    (band-energy style). Real extraction needs an audio library (absent) ->
    ``NotImplementedError``; ``fake=True`` computes deterministic windowed
    byte RMS per band — same vector shape a real MFCC/band-energy stage
    would emit, so downstream similarity/dedup operators compose on it."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<float>"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio feature extraction requires an audio library not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub")
            feats = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw or b"\x00", dtype=np.uint8).astype(np.float64)
                bands = np.array_split(b, n_bands) if len(b) >= n_bands else [b] * n_bands
                feats.append(np.array(
                    [float(np.sqrt((c ** 2).mean())) / 255.0 if len(c) else 0.0
                     for c in bands], dtype=np.float32))
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(kernel, out_schema)
