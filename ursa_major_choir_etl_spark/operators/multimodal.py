"""Multimodal column plumbing (north-star set).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode / feature-extract steps are Arrow-batched ``mapInPandas``
transforms — the real 100 TB shape: the binary payload never leaves
the executor, batches flow through Arrow, output schemas are explicit
StructTypes.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the COMPRESSED-format decoder is a clearly-marked
deterministic fake (metadata derived from the blob bytes). Swap
``_fake_decode_image`` for a real decoder and nothing else changes —
schema, partitioning, and batch shape are production-real.

Formats with a fixed public byte layout need no codec library at
all, and for those the decode is REAL: uncompressed BI_RGB BMP
(``decode_bmp_stats``/``resize_bmp``) and RIFF/WAVE PCM
(``decode_wav_features``) parse true pixels and samples with
struct+numpy, verified against independently-built files in
tests/test_multimodal_real.py.
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

# ---------------------------------------------------------------------------
# REAL decoders — formats parseable with stdlib struct + numpy alone.
#
# JPEG/PNG/MP3/MP4 genuinely need codec libraries this container does
# not ship, so those stay behind the stubs above. Uncompressed BMP
# (BITMAPINFOHEADER, BI_RGB 24/32bpp) and RIFF/WAVE PCM are public,
# fixed-layout formats a few struct.unpack calls decode exactly —
# so THESE decode paths are real, not fakes: real pixels, real PCM
# samples, verified against independently-constructed files in tests.
# The Spark shape is identical to the stubs (narrow Arrow-batched
# mapInPandas, binary in -> typed columns out, no shuffle), which is
# the point: swapping fake for real decode changes only the inner
# kernel, exactly as the stub docstrings promise.
# ---------------------------------------------------------------------------

BMP_DECODE_SCHEMA = (
    "doc_id long, valid boolean, width int, height int, bpp int,"
    " n_pixels long, mean_b double, mean_g double, mean_r double"
)


def _decode_bmp_one(blob: bytes):
    """Parse one uncompressed BI_RGB 24/32bpp BMP; returns the decoded
    (width, height, bpp, HxWx3 BGR uint8 array) or None if the payload
    is not a BMP this decoder supports (magic/compression/bpp check —
    never a guess)."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    pix_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:  # BITMAPCOREHEADER etc. — out of scope
        return None
    width, height = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32) or width <= 0:
        return None
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_size = ((bpp * width + 31) // 32) * 4  # rows pad to 4 bytes
    need = pix_off + row_size * height
    if height == 0 or len(blob) < need:
        return None
    rows = (
        np.frombuffer(blob, dtype=np.uint8, count=row_size * height, offset=pix_off)
        .reshape(height, row_size)[:, : width * nch]
        .reshape(height, width, nch)
    )
    if not top_down:
        rows = rows[::-1]  # BMP stores bottom-up by default
    return width, height, bpp, rows[:, :, :3]  # BGR (alpha dropped)


def decode_bmp_stats(
    blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL image decode: per-payload BMP parse -> geometry + exact
    per-channel means (doubles over the true pixel grid). Non-BMP or
    malformed payloads yield valid=false with NULL stats — degrade,
    never guess. One numpy reshape per row inside an Arrow batch."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    id_col,
                    "valid",
                    "width",
                    "height",
                    "bpp",
                    "n_pixels",
                    "mean_b",
                    "mean_g",
                    "mean_r",
                )
            }
            for rid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                dec = _decode_bmp_one(bytes(blob))
                out[id_col].append(rid)
                if dec is None:
                    out["valid"].append(False)
                    for k in ("width", "height", "bpp", "n_pixels"):
                        out[k].append(None)
                    for k in ("mean_b", "mean_g", "mean_r"):
                        out[k].append(None)
                    continue
                w, h, bpp, px = dec
                means = px.astype(np.float64).mean(axis=(0, 1))
                out["valid"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["n_pixels"].append(w * h)
                out["mean_b"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_r"].append(float(means[2]))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(decode, schema=BMP_DECODE_SCHEMA)


def resize_bmp(
    blobs: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL resize over decoded BMP pixels: nearest-neighbor to
    (out_h x out_w x 3), emitting the resized BGR bytes — the same
    contract as resize_image_stub but on true pixel grids. Invalid
    payloads are dropped (the stats operator is the quarantine
    surface)."""
    import numpy as np

    schema = f"{id_col} long, width int, height int, pixels binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for rid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                dec = _decode_bmp_one(bytes(blob))
                if dec is None:
                    continue
                w, h, _, px = dec
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                ids.append(rid)
                pix.append(px[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {id_col: ids, "width": out_w, "height": out_h, "pixels": pix}
            )

    return blobs.mapInPandas(resize, schema=schema)


WAV_DECODE_SCHEMA = (
    "doc_id long, valid boolean, sample_rate int, channels int,"
    " bits_per_sample int, n_frames long, rms double, peak int"
)


def _decode_wav_one(blob: bytes):
    """Parse one RIFF/WAVE PCM payload (fmt chunk walked properly, 8
    or 16 bit) -> (sample_rate, channels, bits, frames int32 array
    shaped [n_frames, channels]) or None when not decodable PCM."""
    import struct

    import numpy as np

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        csz = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + csz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or channels < 1 or bits not in (8, 16):
        return None
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=(len(data) // 2 // channels) * channels
        ).astype(np.int32)
    else:  # 8-bit WAV PCM is unsigned, centered at 128
        samples = (
            np.frombuffer(
                data, dtype=np.uint8, count=(len(data) // channels) * channels
            ).astype(np.int32)
            - 128
        )
    if samples.size == 0:
        return None
    return rate, channels, bits, samples.reshape(-1, channels)


def decode_wav_features(
    blobs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL audio decode: RIFF/WAVE PCM parse -> format fields + exact
    RMS / peak over the true samples (the audio_features_stub contract
    on real PCM instead of raw payload bytes). Non-WAV payloads yield
    valid=false rows."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {
                k: []
                for k in (
                    id_col,
                    "valid",
                    "sample_rate",
                    "channels",
                    "bits_per_sample",
                    "n_frames",
                    "rms",
                    "peak",
                )
            }
            for rid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                dec = _decode_wav_one(bytes(blob))
                cols[id_col].append(rid)
                if dec is None:
                    cols["valid"].append(False)
                    for k in (
                        "sample_rate",
                        "channels",
                        "bits_per_sample",
                        "n_frames",
                        "rms",
                        "peak",
                    ):
                        cols[k].append(None)
                    continue
                rate, ch, bits, frames = dec
                f64 = frames.astype(np.float64)
                cols["valid"].append(True)
                cols["sample_rate"].append(rate)
                cols["channels"].append(ch)
                cols["bits_per_sample"].append(bits)
                cols["n_frames"].append(frames.shape[0])
                cols["rms"].append(float(np.sqrt(np.mean(f64 * f64))))
                cols["peak"].append(int(np.max(np.abs(frames))))
            yield pd.DataFrame(cols)

    return blobs.mapInPandas(decode, schema=WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic payload builders.
#
# The grading tables carry no binary columns, so the multimodal value
# oracles manufacture their own: each doc_id maps to a REAL, spec-
# conformant BMP / WAV whose every pixel / sample is a closed-form
# integer function of (doc_id, position) — which a SQL oracle can
# recompute without parsing a single byte. The decode queries then run
# blob -> real decoder -> stats with a full value-hash gate: the
# encoder exercises padding, bottom-up vs top-down rows, 24/32bpp,
# 8/16-bit PCM, multi-channel interleave, and unknown RIFF chunks; the
# oracle certifies the decoder's arithmetic end-to-end. A slice of ids
# gets a deliberately undecodable payload to pin the degrade-never-
# guess contract (valid=false, NULL stats) in the same hash.
# ---------------------------------------------------------------------------


def synth_bmp_blob(doc_id: int) -> bytes:
    """Spec-built BMP for ``doc_id``: w=1+id%7, h=1+id%5,
    32bpp when id%3==0 else 24bpp, TOP-DOWN rows when id%7==0,
    channel c of decoded pixel (y, x) = (id*7 + y*11 + x*13 + c*17)
    % 256 (c: 0=B 1=G 2=R; 32bpp alpha is filler the decoder drops).
    ids with id%10==3 get a non-BMP payload (valid=false path)."""
    import struct

    d = int(doc_id)
    if d % 10 == 3:
        return b"JUNK" + bytes([(d + k) % 256 for k in range(16)])
    w, h = 1 + d % 7, 1 + d % 5
    bpp = 32 if d % 3 == 0 else 24
    top_down = d % 7 == 0
    nch = bpp // 8
    row_size = ((bpp * w + 31) // 32) * 4
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            for c in range(3):
                row.append((d * 7 + y * 11 + x * 13 + c * 17) % 256)
            if nch == 4:
                row.append((d + x + y) % 256)
        row += b"\x00" * (row_size - len(row))
        rows += row
    pix_off = 54
    header = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,
        len(rows),
        2835,
        2835,
        0,
        0,
    )
    return bytes(header + dib + rows)


def synth_wav_blob(doc_id: int) -> bytes:
    """Spec-built RIFF/WAVE PCM for ``doc_id``: rate=8000+(id%4)*1000,
    channels=1+id%2, 8-bit when id%5==0 else 16-bit, frames=16+id%16,
    decoded sample (frame t, channel c) =
    ((id*31 + t*7 + c*3) % 2001) - 1000   [16-bit]
    ((id*31 + t*7 + c*3) % 256) - 128     [8-bit, stored unsigned].
    A LIST chunk precedes data (the walker must skip unknown chunks).
    ids with id%10==7 get a RIFF-but-not-WAVE payload."""
    import struct

    d = int(doc_id)
    if d % 10 == 7:
        return b"RIFF" + struct.pack("<I", 4) + b"JUNK"
    rate = 8000 + (d % 4) * 1000
    ch = 1 + d % 2
    bits = 8 if d % 5 == 0 else 16
    nf = 16 + d % 16
    data = bytearray()
    for t in range(nf):
        for c in range(ch):
            v = d * 31 + t * 7 + c * 3
            if bits == 16:
                data += struct.pack("<h", (v % 2001) - 1000)
            else:
                data.append(v % 256)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    note = b"synthetic fixture"  # odd length: exercises word alignment
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"LIST" + struct.pack("<I", len(note)) + note
    if len(note) % 2:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + bytes(data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def with_synth_blob(
    df: DataFrame, kind: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, blob) with the deterministic spec-built payload of
    ``kind`` ('bmp' | 'wav') — Arrow-batched, one narrow projection,
    no shuffle; the binary-ingest stage of the decode value oracles."""
    builder = {"bmp": synth_bmp_blob, "wav": synth_wav_blob}[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].values
            yield pd.DataFrame(
                {id_col: ids, "blob": [builder(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, blob binary"
    )
