"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, batching, partition strategy, UDF
signatures, Arrow batch shape) is real and tested; the actual codec calls are
STUBBED — image/audio libraries are not in this container. Each decode stub
is deterministic (derived from the payload bytes) so tests are stable; swap
``_fake_decode_*`` for PIL/ffmpeg calls on a cluster with the libs installed.

Scale notes: binary payloads never enter a shuffle — decode/feature-extract
runs mapInPandas directly on the scan partitions, and only the (small)
feature columns flow downstream. spark.sql.files.maxPartitionBytes bounds
per-task memory for big media files.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.FloatType(), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def _fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real decode: dims and luma derive from
    the payload hash. Replace with PIL decode + resize on a real cluster."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean_luma = h[2] / 255.0
    return width, height, mean_luma


def _pil_decode_image(payload: bytes) -> tuple[int, int, float]:  # pragma: no cover
    """The real decoder, used automatically when PIL is importable (it is
    not in this container — the seam is exercised in tests by injecting a
    custom decoder through the same parameter)."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    luma = float(
        np.asarray(img.convert("L"), dtype=np.float64).mean() / 255.0
    )
    return w, h, luma


DEFAULT_IMAGE_DECODER = _pil_decode_image if HAVE_PIL else _fake_decode_image


def decode_images(
    media: DataFrame, batch_rows: int = 64, decoder=None
) -> DataFrame:
    """Image decode / feature extraction over binary payloads.

    Arrow batch shape: the UDF sub-batches to ``batch_rows`` so one oversized
    payload batch can't blow executor memory (R1 batching analog).

    ``decoder``: payload bytes → (width, height, mean_luma). Defaults to the
    PIL decoder when PIL is importable, else the deterministic stub; the
    function object is captured by the UDF closure, so a custom decoder runs
    on the executors through the identical distributed path (this is the
    swap-in seam — no code change needed on a cluster with codec libs).
    A decoder exception yields a ``failure`` row, never a stub fallback.
    """
    dec = decoder or DEFAULT_IMAGE_DECODER
    status_ok = "stub_decoded" if dec is _fake_decode_image else "decoded"

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sub = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for media_id, payload in zip(sub["media_id"], sub["payload"]):
                    if payload is None:
                        rows.append((int(media_id), "", 0, None, None, None,
                                     "skipped"))
                        continue
                    payload = bytes(payload)
                    sha = hashlib.sha256(payload).hexdigest()
                    try:
                        w, h, luma = dec(payload)
                        rows.append(
                            (int(media_id), sha, len(payload), w, h, luma,
                             status_ok)
                        )
                    except Exception:
                        rows.append(
                            (int(media_id), sha, len(payload), None, None,
                             None, "failure")
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "sha256", "n_bytes", "width", "height",
                        "mean_luma", "decode_status",
                    ],
                ).astype({"media_id": "int64", "n_bytes": "int32"})

    return media.where(F.col("kind") == "image").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame. The frame
    count/hash derive deterministically from the payload; a real
    implementation replaces the inner loop with an ffmpeg/pyav reader."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n_frames = 1 + payload[0] % 30 if payload else 0
                for fi in range(0, n_frames, every_n):
                    rows.append(
                        (
                            int(media_id),
                            fi,
                            hashlib.sha256(payload + fi.to_bytes(4, "big"))
                            .hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha"]
            ).astype({"media_id": "int64", "frame_idx": "int32"})

    return media.where(F.col("kind") == "video").mapInPandas(
        gen, schema=FRAME_SAMPLE_SCHEMA
    )


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = bytes(rng.randint(0, 256, size=128 + (i % 64)).astype(np.uint8))
        rows.append(
            (i, f"conv-{i % 5}", i % 7, kinds[i % 3], payload, "application/octet-stream")
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
