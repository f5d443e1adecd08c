"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata,
with decode / frame-sample / feature-extract as Arrow-batched ``mapInPandas``
stages (the brief's multimodal surface; the reference is text-only).

The Spark-side plumbing is real and tested — schemas, batch iteration,
fan-out (one payload row -> many frame rows), partition-parallel execution.
The *codec* is where a real deployment plugs in PIL/ffmpeg/torchaudio; those
libraries are not in this container, so:

- `try_import_codecs()` gates the real-decoder path and raises
  ``NotImplementedError`` with a clear message when unavailable, and
- the default path is a clearly-marked DETERMINISTIC FAKE decode that
  derives metadata/frames purely from the payload bytes (length arithmetic,
  byte slicing, sha256) — which keeps every query oracle-checkable.

At 100 TB: payloads live in their own parquet column chunks (columnar reads
skip them unless projected); mapInPandas processes whole Arrow batches per
partition with zero driver involvement; frame fan-out multiplies rows
AFTER the scan, so pushdown still prunes payloads first.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = ("doc_id long, n_bytes int, width int, height int, "
                   "n_frames int, format string")
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_sha string"
FEATURES_SCHEMA = "doc_id long, frame_idx int, features array<double>"

N_FEATURES = 4
_HEX = "0123456789abcdef"


def try_import_codecs() -> None:
    """Real-decoder gate: raises unless an actual image/video codec stack is
    installed. Deployments with PIL/ffmpeg swap `fake_decode_meta` for a
    real parser behind this gate."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real payload decode requires an image/video codec stack "
            "(PIL/ffmpeg); this environment ships none — use the "
            "deterministic fake decode path") from exc


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary column from text (the test corpus has no
    real media); every downstream operator sees only bytes."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """DETERMINISTIC FAKE decode: metadata derived from payload size alone
    (a real decoder parses the container header here)."""
    n = len(payload)
    width = 16 + n % 509
    height = 16 + (n * 31) % 509
    n_frames = 1 + n % 24
    fmt = ("img", "vid", "aud")[n % 3]
    return width, height, n_frames, fmt


def decode_metadata(with_blob: DataFrame) -> DataFrame:
    """mapInPandas decode: (doc_id, payload) -> typed metadata row. One
    Arrow batch in, one out; no fan-out."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m[0] for m in metas],
                "height": [m[1] for m in metas],
                "n_frames": [m[2] for m in metas],
                "format": [m[3] for m in metas],
            })

    return with_blob.select("doc_id", "payload").mapInPandas(decode, METADATA_SCHEMA)


def frame_bounds(n_bytes: int, n_frames: int) -> list[tuple[int, int]]:
    """Fixed-size chunking: frame i covers bytes [i*sz, min((i+1)*sz, n))
    with sz = ceil(n/n_frames); trailing empty frames are dropped."""
    sz = max(1, math.ceil(n_bytes / n_frames))
    out = []
    for i in range(n_frames):
        lo, hi = i * sz, min((i + 1) * sz, n_bytes)
        if lo >= hi:
            break
        out.append((lo, hi))
    return out


def sample_frames(with_blob: DataFrame, every: int = 1) -> DataFrame:
    """mapInPandas frame sampler with FAN-OUT: each payload row yields one
    row per kept frame (`every`-th). The fake 'frame' is a byte slice; a
    real video decoder yields decoded frames at the same row shape."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                _, _, n_frames, _ = fake_decode_meta(b)
                for idx, (lo, hi) in enumerate(frame_bounds(len(b), n_frames)):
                    if idx % every:
                        continue
                    chunk = b[lo:hi]
                    rows.append((doc_id, idx, hi - lo,
                                 hashlib.sha256(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame_bytes", "frame_sha"])

    return with_blob.select("doc_id", "payload").mapInPandas(frames, FRAMES_SCHEMA)


def frame_features(frames: DataFrame, n_features: int = N_FEATURES) -> DataFrame:
    """Feature extraction over sampled frames — here the first hex nibbles
    of the frame hash as doubles (a real extractor embeds pixels). Pure
    column expressions: the fan-out already happened, so this stays in
    whole-stage codegen."""
    feats = F.array(*[
        (F.instr(F.lit(_HEX), F.substring("frame_sha", j + 1, 1)) - 1)
        .cast("double")
        for j in range(n_features)])
    return frames.select("doc_id", "frame_idx", feats.alias("features"))


def resize_stub(with_blob: DataFrame, target_w: int, target_h: int) -> Callable[[], DataFrame]:
    """Resize needs a real codec — exposed but gated: calling the returned
    thunk raises NotImplementedError until a codec stack is installed."""

    def run() -> DataFrame:
        try_import_codecs()
        raise AssertionError("unreachable in this container")  # pragma: no cover

    return run
