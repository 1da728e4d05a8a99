"""Multimodal column plumbing (north-star set).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode / feature-extract steps are Arrow-batched ``mapInPandas``
transforms — the real 100 TB shape: the binary payload never leaves
the executor, batches flow through Arrow, output schemas are explicit
StructTypes.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decoder is a clearly-marked deterministic fake
(metadata derived from the blob bytes). Swap ``_fake_decode_image``
for a real decoder and nothing else changes — schema, partitioning,
and batch shape are production-real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, n_channels int"
)


def with_fake_blob(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a deterministic binary column (the utf-8 text bytes —
    stand-in for an image payload)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("blob"))


def _fake_decode_image(blob: bytes) -> dict:
    """STUB decoder (reference semantics for one blob). Deterministic
    metadata from the payload bytes.

    ``decode_image_metadata`` computes exactly this arithmetic but
    vectorized per Arrow batch; this per-row form is the swap point
    for a REAL decoder — e.g. PIL.Image.open(io.BytesIO(blob)) in a
    container that ships codecs; raise NotImplementedError there on
    unsupported formats instead of guessing.
    """
    n = len(blob)
    return {
        "n_bytes": n,
        "format": "fake/rgb8",
        "width": 64 + (n % 64),
        "height": 64 + ((n // 64) % 64),
        "n_channels": 3,
    }


def decode_image_metadata(
    blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, blob) -> metadata.

    Per-batch pandas work, no per-row Python dispatch; partitioning of
    the input is preserved (narrow transform)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized over the batch: the only per-row Python is
            # len() on the payload. Building a dict per row and then
            # pd.DataFrame(list_of_dicts) re-infers dtypes row-at-a-time
            # and was the dominant cost of this stage (~3x the Arrow
            # transfer at sf0.1). A REAL decoder stays per-row (codecs
            # are), but the metadata assembly around it should still be
            # columnar like this.
            n = pdf[blob_col].map(len).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": n,
                    "format": "fake/rgb8",
                    "width": (64 + (n % 64)).astype("int32"),
                    "height": (64 + ((n // 64) % 64)).astype("int32"),
                    "n_channels": 3,
                }
            )

    return blobs.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


AUDIO_FEAT_SCHEMA = "doc_id long, window_idx int, rms double, zero_crossings int"


def audio_features_stub(
    blobs: DataFrame,
    window_bytes: int = 256,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Audio feature-extraction plumbing: fixed-size windows over the
    payload -> per-window RMS + zero-crossing count (1->N fan-out, the
    torchaudio/librosa shape). STUB: features are computed over raw
    payload bytes centered at 128 — swap the inner math for a real
    PCM decode + feature kernel; schema/batching stay identical."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, zc = [], [], [], []
            for i, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64) - 128.0
                n_win = max(len(arr) // window_bytes, 1)
                for w in range(n_win):
                    seg = arr[w * window_bytes : (w + 1) * window_bytes]
                    if len(seg) == 0:
                        seg = np.zeros(1)
                    ids.append(i)
                    widx.append(w)
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
                    zc.append(int(np.count_nonzero(np.diff(np.sign(seg)))))
            yield pd.DataFrame(
                {id_col: ids, "window_idx": widx, "rms": rms, "zero_crossings": zc}
            )

    return blobs.mapInPandas(feats, schema=AUDIO_FEAT_SCHEMA)


def embed_blob_stub(
    blobs: DataFrame,
    dims: int = 16,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Blob -> embedding plumbing (the decode->embed->index pipeline's
    middle stage): L2-normalized byte-value histogram as a
    deterministic stand-in for a model forward pass. Output
    (id, embedding array<float>) feeds the similarity/ANN operators
    unchanged. Vectorized per Arrow batch — one numpy bincount per
    row, no model dispatch."""
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for blob in pdf[blob_col].values:
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(arr // (256 // dims), minlength=dims).astype(
                    np.float64
                )
                norm = np.linalg.norm(hist)
                vecs.append((hist / norm if norm > 0 else hist).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col].values, "embedding": vecs})

    return blobs.mapInPandas(embed, schema=f"{id_col} long, embedding array<float>")


def frame_sample_stub(
    blobs: DataFrame,
    every_nth: int = 10,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (fake frames = fixed-size byte slices). Demonstrates the 1->N
    mapInPandas fan-out shape used for real frame extraction."""
    schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, fbytes = [], [], []
            for rid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                for i in range(0, max(len(blob) // 100, 1), every_nth):
                    ids.append(rid)
                    fidx.append(i)
                    fbytes.append(blob[i * 100 : (i + 1) * 100])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "frame_bytes": fbytes}
            )

    return blobs.mapInPandas(sample, schema=schema)


def resize_image_stub(
    blobs: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Image-resize plumbing: nearest-neighbor downsample of each
    payload interpreted as the fake decoder's (height x width) byte
    grid, emitting the resized bytes plus the output geometry — the
    thumbnail/normalize stage between decode and embed. STUB pixel
    semantics (real pipelines call PIL/cv2 here) but the Spark shape
    is production-real: a narrow Arrow-batched mapInPandas, one
    numpy fancy-index per row, binary in -> binary out, no shuffle.
    """
    import numpy as np

    schema = f"{id_col} long, width int, height int, pixels binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for rid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                n = len(blob)
                w = 64 + (n % 64)
                h = 64 + ((n // 64) % 64)
                grid = np.frombuffer(blob, dtype=np.uint8)
                # pad/trim the payload to the fake decoder's geometry
                grid = np.resize(grid, h * w).reshape(h, w)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                ids.append(rid)
                pix.append(grid[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": out_w,
                    "height": out_h,
                    "pixels": pix,
                }
            )

    return blobs.mapInPandas(resize, schema=schema)
