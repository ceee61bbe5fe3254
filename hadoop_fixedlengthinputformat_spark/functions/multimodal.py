"""Multimodal column plumbing (SURVEY.md §2.3-J: llm_multimodal_cols).

Image/audio/video payloads are opaque BinaryType columns bundled with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.  The actual codecs (PIL,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels are
STUBBED with deterministic fakes behind ``_HAVE_CODECS`` — the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested (tests/test_llm.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_HAVE_CODECS = False  # PIL / av / soundfile are not installed in this env
try:  # pragma: no cover - exercised only where codecs exist
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except Exception:
    pass

IMAGE_META_SCHEMA = (
    "doc_id bigint, media binary, width int, height int, channels int, "
    "mean_luma double"
)

AUDIO_FRAME_SCHEMA = "doc_id bigint, frame_idx int, rms double"


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Simulate an ingested media column: a BinaryType payload plus typed
    metadata struct.  (In production this is the raw bytes from the
    object store + sidecar metadata.)"""
    # NULL text -> empty payload: the decode kernels are total functions
    # over bytes (a NULL media would crash bytes() worker-side; a real
    # ingest would quarantine, the stub keeps the row with 0 bytes)
    body = F.coalesce(F.col("text"), F.lit(""))
    return df.withColumn("media", body.cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.length(body).alias("n_bytes"),
            F.col("source").alias("origin"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode: derives (w, h, c,
    mean_luma) from a sha256 of the payload.  Replace with PIL when
    _HAVE_CODECS."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_luma = digest[2] / 255.0
    return width, height, 3, mean_luma


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: binary payload -> image features.

    Arrow-batched; each batch decodes vectorized-per-row in the Python
    worker.  At 100 TB this is the pattern: repartition to media-sized
    tasks upstream, keep the decode stateless, emit only features (never
    re-emit the payload unless the sink needs it).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError("real codec path not wired in this env")
            feats = [_fake_decode(bytes(m)) for m in pdf["media"]]
            out = pd.DataFrame(
                feats, columns=["width", "height", "channels", "mean_luma"]
            )
            out.insert(0, "media", pdf["media"].values)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "media").mapInPandas(decode, IMAGE_META_SCHEMA)


def sample_audio_frames(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling stub: emits n_frames rows per payload with a
    deterministic fake RMS (one row per sampled frame — the UDTF-shaped
    expansion a real audio pipeline produces)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf[id_col], pdf["media"]):
                digest = hashlib.sha256(bytes(media)).digest()
                for i in range(n_frames):
                    rows.append((doc_id, i, digest[i % 32] / 255.0))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "rms"])

    return df.select(id_col, "media").mapInPandas(sample, AUDIO_FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes int"
)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize stage (kernel STUBBED — no image libs in this container; a
    real deployment swaps ``_fake_resize`` for PIL/cv2).  The Spark
    plumbing is real: Arrow-batched mapInPandas, stateless per batch,
    output size metadata only — at 100 TB the resized payloads would be
    written straight to an object-store sink from the same task, never
    shuffled."""

    def _fake_resize(payload: bytes) -> tuple[int, int, int]:
        w, h, _c, _luma = _fake_decode(payload)
        # deterministic fake: output byte count scales with target area
        return w, h, out_w * out_h * 3

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dims = [_fake_resize(bytes(m)) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "out_width": out_w,
                    "out_height": out_h,
                    "out_bytes": [d[2] for d in dims],
                }
            )

    return df.select(id_col, "media").mapInPandas(run, RESIZE_SCHEMA)
