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
    """STUB decoder. Deterministic metadata from the payload bytes.

    Replace with e.g. PIL.Image.open(io.BytesIO(blob)) in a container
    that ships codecs; raise NotImplementedError there on unsupported
    formats instead of guessing.
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
            meta = pdf[blob_col].map(_fake_decode_image)
            out = pd.DataFrame(list(meta))
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return blobs.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


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
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col]
                for i in range(0, max(len(blob) // 100, 1), every_nth):
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": i,
                            "frame_bytes": blob[i * 100 : (i + 1) * 100],
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return blobs.mapInPandas(sample, schema=schema)
