"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schemas, Arrow-batched ``mapInPandas``
transforms, partition shaping — is real and tested; the *codec* step is
stubbed (this container has no image/audio libraries): ``decode_image``
falls back to a clearly-marked deterministic fake when PIL is absent, and
the fake derives metadata purely from the payload bytes so tests are
reproducible.

Scale shape: payloads stay in executor memory as Arrow binary buffers;
``mapInPandas`` streams record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so a 100 TB corpus of
media blobs flows through without ever materializing a partition as
Python objects row-by-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # codec gate: not installed in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach typed metadata to a binary column — JVM-side expressions
    only (length + md5), no Python in the hot path."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("checksum"),
        ),
    )


def _make_decoders():
    """Codec pair built as CLOSURES (non-importable qualnames), so
    cloudpickle ships them by value into Python workers — the driver
    harness runs from an arbitrary cwd where this package isn't on the
    worker PYTHONPATH."""

    def fake_decode(payload: bytes) -> tuple[int, int, float]:
        # deterministic stand-in for an image codec: derives (width,
        # height, mean_byte) from the payload alone; used when PIL is
        # absent so the Arrow plumbing stays testable in this container
        n = len(payload)
        width = 1 + (n % 64)
        height = 1 + (n // 64) % 64
        mean = float(sum(payload) / n) if n else 0.0
        return width, height, mean

    def pil_decode(payload: bytes) -> tuple[int, int, float]:
        # real codec branch: (width, height, mean grayscale pixel value)
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as img:
            width, height = img.size
            data = list(img.convert("L").getdata())
        mean = float(sum(data) / len(data)) if data else 0.0
        return width, height, mean

    return fake_decode, pil_decode


_fake_decode, _pil_decode = _make_decoders()


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    use_fake_codec: bool | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The codec is ``_pil_decode`` when PIL is importable, else the
    deterministic ``_fake_decode`` (this container has no image libs);
    ``use_fake_codec`` overrides the autodetect for tests.  The plumbing —
    binary columns through ``mapInPandas`` record batches — is the
    scale-relevant part either way.
    """
    fake = (not _HAVE_PIL) if use_fake_codec is None else use_fake_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if fake else _pil_decode
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "mean_byte": [f[2] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing for video payloads: emits one row per
    sampled offset (explode on a JVM-computed offset sequence) — the
    real frame decode would replace the identity payload slice."""
    n = F.length("payload").cast("long")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


AUDIO_WINDOWS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("peak_amp", T.IntegerType()),
    ]
)


def extract_audio_windows(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    window_bytes: int = 64,
) -> DataFrame:
    """Windowed 'audio' features over binary payloads — the audio leg of
    the multimodal plumbing (image: ``extract_image_features``; video:
    ``sample_frames``).  The codec is stubbed exactly like the image
    fake: payload bytes ARE the samples (u8 PCM stand-in; a real
    deployment swaps in soundfile/ffmpeg inside the same closure), so
    the per-window aggregates derive purely from the bytes and replay in
    a SQL oracle.  Emits one row per ``window_bytes`` window:
    (media_id, window_idx, n_samples, mean_amp, peak_amp); the mean is
    an exact-int sum divided once in double, bit-identical cross-engine.

    Scale shape: Arrow record batches stream through ``mapInPandas``
    (payloads never materialize row-by-row as Python objects); output
    cardinality is bytes/window — linear in payload volume; the closure
    pickles BY VALUE, so the worker needs no package import (the
    foreign-cwd driver-harness constraint)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids: list[int] = []
            widx: list[int] = []
            ns: list[int] = []
            mean: list[float] = []
            peak: list[int] = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                for w in range(0, int(b.size), window_bytes):
                    seg = b[w : w + window_bytes]
                    ids.append(int(mid))
                    widx.append(w // window_bytes)
                    ns.append(int(seg.size))
                    mean.append(float(int(seg.sum(dtype=np.int64))) / seg.size)
                    peak.append(int(seg.max()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "mean_amp": pd.Series(mean, dtype="float64"),
                    "peak_amp": pd.Series(peak, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_WINDOWS_SCHEMA)
