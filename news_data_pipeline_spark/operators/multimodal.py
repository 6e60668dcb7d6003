"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

Design (north-star extension; the reference is text-only):

* Media travels as an opaque ``binary`` payload column plus typed
  metadata columns — never exploded into per-pixel rows. Spark shuffles
  and stores binary efficiently; decode happens only inside Arrow-batched
  Python (``mapInPandas``), the one place imperative per-item logic is
  justified.
* Real codecs (PIL/librosa/av) are NOT in this container, so decode is
  gated: if the library import fails, payloads in the engine's
  deterministic FAKE container formats (below) are decoded by the pure-
  Python parser, and anything else raises ``NotImplementedError`` with
  the library name. The Spark-side plumbing — schemas, UDF signatures,
  batch shapes, partitioning — is real and tested either way.
* Each operator streams record batches (one pandas DataFrame per Arrow
  batch, bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``) —
  no per-row Python calls, no whole-partition materialization, so
  executor memory stays bounded by batch size at 100 TB.

Fake container formats (little-endian u32 fields, deterministic):

* image: ``FIMG | width | height | width*height gray bytes``
* audio: ``FAUD | sample_rate | n_samples | n_samples bytes``
* video: ``FVID | n_frames | frame_w | frame_h | frames (gray bytes)``
"""

from __future__ import annotations

import math

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from news_data_pipeline_spark.operators.fanout import fan_out

IMG_MAGIC = b"FIMG"
AUD_MAGIC = b"FAUD"
VID_MAGIC = b"FVID"

_MAGICS = {
    IMG_MAGIC: "image/x-fake",
    AUD_MAGIC: "audio/x-fake",
    VID_MAGIC: "video/x-fake",
    b"\x89PNG": "image/png",
}


# --- fake payload builders (test/fixture side, pure Python) ------------------
def fake_image_bytes(seed: str, width: int, height: int) -> bytes:
    """Deterministic gray image: pixels from an iterated-md5 hex chain.

    The chain iterates over hex STRINGS (``md5(seed)``, ``md5(md5(seed))``,
    ...) rather than raw digests, and pixels are the hex pairs decoded to
    bytes — so any ANSI-SQL engine whose ``md5`` takes VARCHAR (DuckDB's
    does; BLOB overloads don't exist) can regenerate the exact pixels and
    oracle-check decode results end-to-end.
    """
    need = width * height
    chain = ""
    block = seed
    while len(chain) < 2 * need:
        block = hashlib.md5(block.encode()).hexdigest()
        chain += block
    return (
        IMG_MAGIC
        + struct.pack("<II", width, height)
        + bytes.fromhex(chain[: 2 * need])
    )


def fake_audio_bytes(seed: str, sample_rate: int, n_samples: int) -> bytes:
    body = fake_image_bytes(seed, n_samples, 1)[12:]
    return AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + body


def fake_video_bytes(seed: str, n_frames: int, w: int, h: int) -> bytes:
    frames = b"".join(
        fake_image_bytes(f"{seed}:{i}", w, h)[12:] for i in range(n_frames)
    )
    return VID_MAGIC + struct.pack("<III", n_frames, w, h) + frames


# --- JVM-side (no Python) metadata ops ---------------------------------------
def sniff_media_type(payload: Column) -> Column:
    """Magic-byte dispatch — pure Catalyst expressions over the binary
    prefix, so a 100-TB manifest scan never touches Python.

    JPEG matches on the 3-byte SOI prefix (covers JFIF \\xe0, EXIF \\xe1
    and friends); RIFF containers disambiguate on bytes 9-12 (WAVE vs
    WEBP vs AVI) instead of assuming audio.
    """
    prefix = F.substring(payload, 1, 4)
    riff_kind = F.substring(payload, 9, 4)
    out = F.lit("application/octet-stream")
    for magic, mime in _MAGICS.items():
        out = F.when(prefix == F.lit(magic), F.lit(mime)).otherwise(out)
    out = F.when(
        F.substring(payload, 1, 3) == F.lit(b"\xff\xd8\xff"), F.lit("image/jpeg")
    ).otherwise(out)
    return (
        F.when(
            prefix == F.lit(b"RIFF"),
            F.when(riff_kind == F.lit(b"WAVE"), F.lit("audio/wav"))
            .when(riff_kind == F.lit(b"WEBP"), F.lit("image/webp"))
            .when(riff_kind == F.lit(b"AVI "), F.lit("video/avi"))
            .otherwise(F.lit("application/octet-stream")),
        ).otherwise(out)
    )


def media_manifest(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed metadata for every payload: size, hash, sniffed type.

    The catalog pass that runs BEFORE any decode fan-out, letting the
    pipeline partition/route by media type with zero Python cost.
    """
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        F.length(p).cast("long").alias("n_bytes"),
        F.md5(p).alias("content_hash"),
        sniff_media_type(p).alias("media_type"),
    )


# --- decode stubs (Arrow-batched Python) -------------------------------------
def _decode_image_bytes(b: bytes) -> tuple[int, int, bytes]:
    """(width, height, gray pixels). Fake container parses natively; real
    formats need PIL, which is absent here — the gate is explicit."""
    if b[:4] == IMG_MAGIC:
        w, h = struct.unpack("<II", b[4:12])
        return w, h, b[12 : 12 + w * h]
    try:  # pragma: no cover - PIL not installed in this container
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(b)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError as exc:
        raise NotImplementedError(
            f"decoding {b[:4]!r} payloads requires PIL (not installed); "
            "only the FIMG fake container decodes without it"
        ) from exc


DECODED_IMAGE_SCHEMA = (
    "id long, width int, height int, mean_pixel double, pixel_hash string"
)


def decode_images(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Decode image payloads to (dims, mean intensity, pixel hash).

    ``mapInPandas``: one Arrow batch in, one out — the canonical decode
    fan-out shape. Output is small typed columns, never raw pixels, so
    the shuffle after a decode stays narrow.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _decode_image_bytes(bytes(b))
                mean = sum(px) / max(len(px), 1)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        # explicit half-up at 4dp: Python's round() is
                        # banker's, SQL engines' is half-away — means like
                        # s/32 land exactly on ties, so pin one rule both
                        # sides can express (floor(x*1e4 + 0.5)/1e4)
                        math.floor(mean * 10000.0 + 0.5) / 10000.0,
                        # hash the HEX encoding: VARCHAR-only SQL md5s can
                        # reproduce it; raw-byte digests they cannot
                        hashlib.md5(px.hex().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mean_pixel", "pixel_hash"]
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(decode, DECODED_IMAGE_SCHEMA)


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, *, scale: int = 2
) -> DataFrame:
    """Integer-factor downsample, re-encoded into the fake container.

    Deterministic nearest-neighbor (every ``scale``-th pixel per axis) —
    the real-codec path would swap the kernel, not the plumbing.
    Returns (id, payload) with the resized payload, same schema shape as
    the input so resize stages compose.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _decode_image_bytes(bytes(b))
                nw, nh = max(w // scale, 1), max(h // scale, 1)
                resized = bytes(
                    px[(y * scale) * w + (x * scale)]
                    for y in range(nh)
                    for x in range(nw)
                )
                ids.append(i)
                payloads.append(IMG_MAGIC + struct.pack("<II", nw, nh) + resized)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return fan_out(df.select(id_col, payload_col)).mapInPandas(resize, "id long, payload binary")


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, *, every: int = 2
) -> DataFrame:
    """Explode video payloads into every-``every``-th frame as an image
    payload row: (id, frame_no, payload). The row-expansion is bounded by
    n_frames/every per video; downstream image ops compose unchanged."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, payloads = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if b[:4] != VID_MAGIC:
                    raise NotImplementedError(
                        "only FVID fake videos decode without codec libs"
                    )
                n, w, h = struct.unpack("<III", b[4:16])
                fsize = w * h
                for f in range(0, n, every):
                    frame = b[16 + f * fsize : 16 + (f + 1) * fsize]
                    ids.append(i)
                    frame_nos.append(f)
                    payloads.append(IMG_MAGIC + struct.pack("<II", w, h) + frame)
            yield pd.DataFrame(
                {"id": ids, "frame_no": frame_nos, "payload": payloads}
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        sample, "id long, frame_no int, payload binary"
    )


def audio_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Per-clip features from the fake audio container: duration from the
    header, amplitude stats from the body."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if b[:4] != AUD_MAGIC:
                    raise NotImplementedError(
                        "only FAUD fake audio decodes without codec libs"
                    )
                sr, n = struct.unpack("<II", b[4:12])
                body = b[12 : 12 + n]
                # explicit half-up at 4dp (same rule as decode_images):
                # Python's round() is banker's, SQL engines' is
                # half-away — pin one rule both sides can express
                rows.append(
                    (
                        i,
                        sr,
                        math.floor(n / sr * 10000.0 + 0.5) / 10000.0
                        if sr
                        else 0.0,
                        math.floor(
                            sum(body) / max(len(body), 1) * 10000.0 + 0.5
                        )
                        / 10000.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "duration_sec", "mean_amplitude"]
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        feats, "id long, sample_rate int, duration_sec double, mean_amplitude double"
    )


def text_embeddings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width_col: str,
    height_col: str,
    *,
    dim: int = 16,
) -> DataFrame:
    """Text tower of the deterministic joint text<->image space:
    (id, embedding), the CLIP-text-encoder stand-in paired with
    ``image_embeddings`` as the vision tower.

    The alignment contract a trained CLIP provides ("a caption and its
    image land near each other") is here BY CONSTRUCTION: the text
    tower runs the same iterated-md5 pixel chain that
    ``fake_image_bytes`` renders and histograms it into the same
    ``dim`` intensity bins — so a text and the image rendered from it
    embed identically, texts sharing visual statistics land close, and
    cross-modal retrieval is exactly nearest-neighbor search in the
    shared space. No image payload ever exists on this path: text goes
    straight to the joint space, which is the point of the two-tower
    layout. Swap the body for a real text encoder under the same
    mapInPandas shape; the (id, embedding) contract and downstream
    ANN operators don't change. ``width_col``/``height_col`` carry the
    render geometry (the joint-space "projection config") so both
    towers agree on it per id.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, t, w, h in zip(
                pdf[id_col], pdf[text_col], pdf[width_col], pdf[height_col]
            ):
                px = fake_image_bytes(t or "", int(w), int(h))[12:]
                hist = [0] * dim
                for byte in px:
                    hist[byte * dim // 256] += 1
                total = max(len(px), 1)
                ids.append(i)
                vecs.append(
                    [
                        math.floor(hv / total * 1e6 + 0.5) / 1e6
                        for hv in hist
                    ]
                )
            yield pd.DataFrame({"id": ids, "embedding": vecs})

    return fan_out(
        df.select(id_col, text_col, width_col, height_col)
    ).mapInPandas(embed, "id long, embedding array<double>")


def image_embeddings(
    df: DataFrame, id_col: str, payload_col: str, *, dim: int = 16
) -> DataFrame:
    """Embed decoded images as fixed-dim vectors: (id, embedding).

    The bridge from the multimodal plumbing to the similarity operators:
    a normalized ``dim``-bin intensity histogram per image — the
    deterministic stand-in for a vision encoder (swap the function body
    for a real model under the same mapInPandas shape; batch size and
    output schema don't change). Output feeds ``similarity.cosine_topk``
    / ``ivf_topk`` / ``dedup.embedding_neardup_pairs`` unchanged.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                _, _, px = _decode_image_bytes(bytes(b))
                hist = [0] * dim
                for byte in px:
                    hist[byte * dim // 256] += 1
                total = max(len(px), 1)
                ids.append(i)
                # floor-settled half-up: Python round() is banker's and
                # SQL round()s vary per engine/build; bin/total is an
                # exact integer ratio — the half-way-cell class
                vecs.append(
                    [
                        math.floor(h / total * 1e6 + 0.5) / 1e6
                        for h in hist
                    ]
                )
            yield pd.DataFrame({"id": ids, "embedding": vecs})

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        embed, "id long, embedding array<double>"
    )
