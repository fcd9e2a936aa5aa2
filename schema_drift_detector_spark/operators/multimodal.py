"""Multimodal (image/audio/video) columns as opaque binaries with typed
metadata, processed via Arrow-batched mapInPandas.

Real in this container: the Spark-side plumbing — schemas, batch
iteration, vectorized byte math (histograms, checksums, frame
sampling over numpy buffers). Stubbed: actual codec decode (PIL/ffmpeg
are not installed here) — ``decode_image`` parses the deterministic
synthetic header instead and raises NotImplementedError for real codecs
unless PIL is importable (import-gated, never assumed).

Scale notes: binary payloads never leave the executor (mapInPandas is
Arrow-batched, per-batch numpy); outputs are small typed features. At
100 TB the media table is read with spark.read.format('binaryFile') or
as an Iceberg binary column — identical code path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.synth import SynthConfig, _mix

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MAGIC = b"SDXM"  # synthetic media header: MAGIC + w(2) + h(2) + frames(2)


def synth_media(
    spark: SparkSession,
    cfg: SynthConfig = SynthConfig(),
    n: int = 1000,
    corrupt_every: int = 0,
) -> DataFrame:
    """Deterministic opaque blobs for the first ``n`` catalog assets:
    header (magic, dims, frame count) + seeded payload bytes.

    corrupt_every=k > 0 makes every k-th asset undecodable in one of
    three deterministic ways (bad magic / truncated header / headered
    but empty body) so decode-guard and sentinel paths are exercised
    by real rows, not just unit fixtures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy().astype(np.int64)
            h = _mix(ids, cfg.seed + 99)
            kinds = np.array(["image", "audio", "table"])[(ids % 3)]
            width = (64 + (h % np.uint64(192))).astype(np.int64)
            height = (64 + ((h >> np.uint64(8)) % np.uint64(192))).astype(np.int64)
            frames = np.where(kinds == "image", 1, 4 + (h % np.uint64(12)).astype(np.int64))
            payloads = []
            for i, ident in enumerate(ids):
                size = int(width[i] * height[i] // 64) * int(frames[i])
                body = _mix(np.arange(size, dtype=np.int64) + ident * 7919, cfg.seed + 7)
                head = (
                    MAGIC
                    + int(width[i]).to_bytes(2, "big")
                    + int(height[i]).to_bytes(2, "big")
                    + int(frames[i]).to_bytes(2, "big")
                )
                blob = head + (body % 256).astype(np.uint8).tobytes()
                if corrupt_every > 0 and ident % corrupt_every == 0:
                    mode = int(ident) % 3
                    if mode == 0:
                        blob = b"XXXX" + blob[4:]  # wrong magic
                    elif mode == 1:
                        blob = blob[:8]  # truncated: header cut mid-field
                    else:
                        # valid header claiming frames, but zero payload
                        blob = MAGIC + blob[4:8] + (3).to_bytes(2, "big")
                payloads.append(blob)
            yield pd.DataFrame(
                {
                    "media_ref": np.char.add(
                        "asset-", np.char.zfill(ids.astype("U12"), 8)
                    ),
                    "kind": kinds,
                    "content": payloads,
                    "width": width.astype(np.int32),
                    "height": height.astype(np.int32),
                    "n_frames": frames.astype(np.int32),
                    "sample_rate": np.where(kinds == "audio", 16000, 0).astype(np.int32),
                }
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("entropy", T.DoubleType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), True),
    ]
)


def extract_byte_features(media: DataFrame, nbins: int = 16) -> DataFrame:
    """REAL feature extraction: per-blob byte histogram + Shannon
    entropy, vectorized numpy inside Arrow batches. nbins must be a
    power of two ≤ 256 (binning is a bit shift of the byte value);
    anything else would silently mis-shape the histogram."""
    if nbins <= 0 or nbins > 256 or (nbins & (nbins - 1)) != 0:
        raise ValueError(f"nbins must be a power of two in [1, 256], got {nbins}")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            refs, sizes, ents, hists = [], [], [], []
            for ref, content in zip(b["media_ref"], b["content"]):
                buf = np.frombuffer(content or b"", dtype=np.uint8)
                hist = np.bincount(buf >> int(np.log2(256 // nbins)), minlength=nbins)
                p = hist / max(len(buf), 1)
                p = p[p > 0]
                refs.append(ref)
                sizes.append(len(buf))
                ents.append(float(-(p * np.log2(p)).sum()) if len(p) else 0.0)
                hists.append(hist.astype(np.int64))
            yield pd.DataFrame(
                {"media_ref": refs, "size_bytes": sizes, "entropy": ents, "byte_histogram": hists}
            )

    return media.select("media_ref", "content").mapInPandas(feats, schema=BYTE_FEATURES_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode step. Synthetic SDXM blobs are decoded for real (header
    parse + payload stats). Non-synthetic content requires a codec
    library: import-gated on PIL; otherwise NotImplementedError when
    ``strict`` else a null row with decoder='unavailable'."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # import-gated real-codec path; absent in this container
            from PIL import Image  # noqa: F401

            have_pil = True
        except Exception:
            have_pil = False
        for b in batches:
            rows = []
            for ref, content in zip(b["media_ref"], b["content"]):
                blob = bytes(content or b"")
                if blob[:4] == MAGIC:
                    w = int.from_bytes(blob[4:6], "big")
                    h = int.from_bytes(blob[6:8], "big")
                    fr = int.from_bytes(blob[8:10], "big")
                    body = np.frombuffer(blob[10:], dtype=np.uint8)
                    rows.append((ref, w, h, fr, float(body.mean()) if len(body) else 0.0, "sdxm"))
                elif strict:
                    raise NotImplementedError(
                        "real-codec decode is stubbed: PIL "
                        + ("is importable but the decode body is not implemented here"
                           if have_pil else "is not installed in this container")
                    )
                else:
                    rows.append((ref, None, None, None, None, "unavailable"))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "n_frames", "mean_byte", "decoder"]
            )

    return media.select("media_ref", "content").mapInPandas(dec, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """'Resize' = deterministic spatial downsample of the synthetic
    payload (every factor-th byte per axis); real plumbing (header
    rewrite, Arrow batches), codec-free by design. A real image resize
    would slot into the same signature behind the PIL import gate."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, content in zip(b["media_ref"], b["content"]):
                blob = bytes(content or b"")
                if blob[:4] != MAGIC:
                    rows.append((ref, None, None, None))
                    continue
                w = int.from_bytes(blob[4:6], "big")
                h = int.from_bytes(blob[6:8], "big")
                fr = int.from_bytes(blob[8:10], "big")
                nw, nh = max(1, w // factor), max(1, h // factor)
                body = np.frombuffer(blob[10:], dtype=np.uint8)
                out = body[:: factor * factor]  # proportional byte decimation
                head = MAGIC + nw.to_bytes(2, "big") + nh.to_bytes(2, "big") + fr.to_bytes(2, "big")
                rows.append((ref, nw, nh, head + out.tobytes()))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "content"])

    return media.select("media_ref", "content").mapInPandas(rs, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_checksum", T.LongType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for multi-frame (audio/video-like) blobs: split
    the payload into n_frames equal chunks, keep every ``every_n``-th,
    emit a deterministic checksum per kept frame. One input row → many
    output rows (mapInPandas handles the fan-out)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            refs, idxs, sums = [], [], []
            for ref, content in zip(b["media_ref"], b["content"]):
                blob = bytes(content or b"")
                if blob[:4] != MAGIC:
                    # undecodable blob: emit a sentinel row (frame_index
                    # -1, null checksum) like decode_media's
                    # 'unavailable' row — never vanish silently
                    refs.append(ref)
                    idxs.append(-1)
                    sums.append(None)
                    continue
                fr = int.from_bytes(blob[8:10], "big")
                body = np.frombuffer(blob[10:], dtype=np.uint8)
                if fr <= 0 or len(body) < fr:
                    # len(body) < fr would make chunk = 0 and every
                    # "frame" an empty slice with checksum 0 — that is
                    # an undecodable claim (more frames than bytes), so
                    # it takes the sentinel path like the other guards
                    refs.append(ref)
                    idxs.append(-1)
                    sums.append(None)
                    continue
                chunk = len(body) // fr
                for i in range(0, fr, every_n):
                    seg = body[i * chunk : (i + 1) * chunk]
                    refs.append(ref)
                    idxs.append(i)
                    sums.append(int(seg.astype(np.int64).sum()))
            yield pd.DataFrame(
                {"media_ref": refs, "frame_index": idxs, "frame_checksum": sums}
            )

    return media.select("media_ref", "content").mapInPandas(frames, schema=FRAME_SCHEMA)
