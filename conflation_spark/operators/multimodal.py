"""Multimodal column handling: image/audio/video as opaque binary + metadata.

The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernels are stubbed behind ``NotImplementedError`` with a
deterministic fake used by tests — but the Spark-side plumbing is real:
schemas, mapInPandas batch iteration, Arrow binary transfer, partition
sizing. Swap ``_decode_image_stub`` for a real decoder on a cluster with
the libs installed and nothing else changes.

Media rides in documents as ``kind='media'`` spans (``media_ref`` keys into
a blobs table), mirroring the reference where every trace point IS an image
(Mapillary image ids, /root/reference/conflation/trace_fetching/mapillary.py:41,448-456).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, content_sha256 string"
)
IMAGE_FEATURE_SCHEMA = (
    "media_ref string, width int, height int, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_sha1 string"

FEATURE_DIM = 16


def synth_blobs(spark, documents: DataFrame) -> DataFrame:
    """Deterministic fake blob table for every media_ref in the documents
    (content = repeated sha-derived bytes; stands in for real object-store
    payloads)."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.media_ref") != "")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    payload = F.unhex(F.sha2(F.col("media_ref").cast("binary"), 256))
    # kind from the ref's last char (ascii % 3): deterministic AND
    # expressible in DuckDB (crc32 is not), so media_metadata has an oracle
    kind_n = F.ascii(F.substring(F.col("media_ref"), -1, 1)) % 3
    return refs.withColumn("content", payload).withColumn(
        "media_kind",
        F.when(kind_n == 0, "image").when(kind_n == 1, "audio").otherwise("video"),
    )


try:  # capability probe: use a real decoder wherever the lib exists
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # container has no PIL — stub path
    _PILImage = None
    HAS_PIL = False


def _decode_image_stub(content: bytes) -> tuple[int, int, np.ndarray]:
    """STUB: real impl would be PIL/turbojpeg decode. Deterministic fake:
    dims + feature vector derived from the content digest."""
    if content is None:
        raise NotImplementedError("real image decode requires PIL — not in container")
    d = hashlib.sha1(content).digest()
    width = 64 + d[0]
    height = 64 + d[1]
    feat = np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, feat


def _decode_image_pil(content: bytes) -> tuple[int, int, np.ndarray]:
    """Real decode (used when PIL is importable): dims + a 16-dim feature =
    mean luminance over a 4x4 grid of the image."""
    import io

    img = _PILImage.open(io.BytesIO(content)).convert("L")
    width, height = img.size
    arr = np.asarray(img, dtype=np.float32) / 255.0
    gy = np.array_split(arr, 4, axis=0)
    feat = np.array(
        [cell.mean() if cell.size else 0.0 for row in gy for cell in np.array_split(row, 4, axis=1)],
        dtype=np.float32,
    )
    return width, height, feat


DEFAULT_IMAGE_DECODER = _decode_image_pil if HAS_PIL else _decode_image_stub


def media_metadata(blobs: DataFrame) -> DataFrame:
    """Typed metadata over the binary column — pure column ops.

    The content digest is sha256 over the UPPERCASE HEX encoding of the
    bytes (not the raw bytes): engine-portable — DuckDB 1.0 can hash
    VARCHAR but not BLOB, so this form has an exact SQL oracle while
    staying a collision-resistant fingerprint of the binary content.
    """
    return blobs.select(
        "media_ref",
        "media_kind",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2(F.hex("content"), 256).alias("content_sha256"),
    )


def extract_image_features(blobs: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas over binary content -> (width, height, feature[16]).

    Real Arrow binary batches; the decode kernel defaults to PIL when the
    lib is importable (capability probe) and the deterministic stub when not.
    Partition-friendly: stateless per batch, no driver collection.
    """
    decode = decoder or DEFAULT_IMAGE_DECODER

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                w, h, feat = decode(bytes(content))
                rows.append((ref, w, h, feat.tolist()))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "feature"])

    imgs = blobs.where(F.col("media_kind") == "image").select("media_ref", "content")
    return imgs.mapInPandas(op, schema=IMAGE_FEATURE_SCHEMA)


def sample_frames(blobs: DataFrame, every_n: int = 2, n_frames: int = 3) -> DataFrame:
    """Video frame-sampling plumbing: mapInPandas emitting n_frames rows per
    video blob (decode stubbed: frame digest derived from content+idx)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                for i in range(0, n_frames * every_n, every_n):
                    digest = hashlib.sha1(bytes(content) + i.to_bytes(4, "big")).hexdigest()
                    rows.append((ref, i, digest))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame_sha1"])

    vids = blobs.where(F.col("media_kind") == "video").select("media_ref", "content")
    return vids.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)
