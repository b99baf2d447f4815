"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Lossless raster formats (PPM/PGM, 24-bit BMP, 8-bit PNG) decode FOR
REAL via the pure-stdlib codec in `webtext/codecs.py`
(`decode_images_real`).  Compressed codecs (JPEG/GIF/video) remain
stubbed — this container ships no libjpeg/ffmpeg — behind `FakeCodec`
(a deterministic stand-in) and `RealCodecUnavailable`.  Everything
Spark-side is real and tested either way: schema, Arrow batch shape,
partitioning, and the `mapInPandas` UDF signatures (swap in a
PIL/ffmpeg-backed codec object on a cluster with the libs installed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RealCodecUnavailable(NotImplementedError):
    """Raised by the real-decoder entry points in this container."""


class FakeCodec:
    """Deterministic stand-in decoder: 'decodes' a binary payload into a
    small fake raster whose pixels are a pure function of the bytes."""

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        h = hashlib.md5(payload).digest()
        w = 4 + h[0] % 13
        ht = 4 + h[1] % 13
        rng = np.random.default_rng(int.from_bytes(h[2:10], "little"))
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    @staticmethod
    def resize(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
        ys = np.linspace(0, img.shape[0] - 1, size[0]).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, size[1]).astype(int)
        return img[np.ix_(ys, xs)]

    @staticmethod
    def frame_sample(payload: bytes, n_frames: int) -> list[np.ndarray]:
        return [
            FakeCodec.decode(payload + bytes([i])) for i in range(n_frames)
        ]


def decode_images(df: DataFrame, binary_col: str = "html",
                  id_col: str = "url", thumb: tuple[int, int] = (4, 4),
                  codec=FakeCodec) -> DataFrame:
    """binary column → (id, width, height, n_bytes, thumb_md5).

    Real plumbing: Arrow batches of binary payloads in, vectorized-ish
    decode per batch, fixed output schema out.  The per-row loop is inside
    the batch (decoders are inherently per-payload); batch sizing bounds
    executor memory.
    """

    def run(batches):
        for pdf in batches:
            ids, ws, hs, nb, th = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                img = codec.decode(bytes(payload))
                small = codec.resize(img, thumb)
                ids.append(rid)
                ws.append(img.shape[1])
                hs.append(img.shape[0])
                nb.append(len(payload))
                th.append(hashlib.md5(small.tobytes()).hexdigest())
            yield pd.DataFrame({
                id_col: ids, "width": ws, "height": hs,
                "n_bytes": nb, "thumb_md5": th,
            })

    # NULL payloads (e.g. a page with NULL text cast to binary) are
    # skipped — bytes(None) would kill the whole stage on one bad row
    return df.select(id_col, binary_col).filter(
        F.col(binary_col).isNotNull()
    ).mapInPandas(
        run,
        schema=f"{id_col} string, width int, height int, n_bytes long, "
               f"thumb_md5 string",
    )


def image_features(df: DataFrame, binary_col: str = "html",
                   id_col: str = "url", size: tuple[int, int] = (8, 8),
                   codec=FakeCodec) -> DataFrame:
    """binary column → (id, feature array<double>): decode → resize →
    per-channel mean/std + 16-bin gray histogram (22-dim).  The feature
    column is the bridge into the similarity stack — downstream the
    LSH-bucketed ANN / near-dup operators consume it exactly like the
    ``embeddings`` table.  Feature math is vectorized per batch (one
    stacked (B, h, w, 3) tensor); only the codec itself is per-payload."""
    fdim = 6 + 16

    def run(batches):
        for pdf in batches:
            imgs = [
                codec.resize(codec.decode(bytes(p)), size)
                for p in pdf[binary_col]
            ]
            if imgs:
                T = np.stack(imgs).astype(np.float64)  # (B, h, w, 3)
                mean = T.mean(axis=(1, 2))             # (B, 3)
                std = T.std(axis=(1, 2))               # (B, 3)
                gray = T.mean(axis=3)                  # (B, h, w)
                hist = np.stack([
                    np.histogram(g, bins=16, range=(0.0, 256.0))[0]
                    for g in gray
                ]).astype(np.float64)
                denom = hist.sum(axis=1, keepdims=True)
                hist = hist / np.where(denom > 0, denom, 1.0)
                feats = np.concatenate([mean, std, hist], axis=1)
            else:
                feats = np.zeros((0, fdim))
            yield pd.DataFrame({
                id_col: pdf[id_col].tolist(),
                "feature": [row.tolist() for row in feats],
            })

    # NULL payloads (e.g. a page with NULL text cast to binary) are
    # skipped — bytes(None) would kill the whole stage on one bad row
    return df.select(id_col, binary_col).filter(
        F.col(binary_col).isNotNull()
    ).mapInPandas(
        run, schema=f"{id_col} string, feature array<double>"
    )


def frame_features(df: DataFrame, binary_col: str = "html",
                   id_col: str = "url", n_frames: int = 3,
                   size: tuple[int, int] = (8, 8),
                   codec=FakeCodec) -> DataFrame:
    """Video-style payloads → long (id, frame_id, feature): sample
    ``n_frames``, one feature row per frame (the exploded layout a frame-
    level dedup or search op consumes)."""

    def run(batches):
        for pdf in batches:
            ids, fids, feats = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                for fi, frame in enumerate(
                    codec.frame_sample(bytes(payload), n_frames)
                ):
                    small = codec.resize(frame, size).astype(np.float64)
                    f = np.concatenate([
                        small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                    ])
                    ids.append(rid)
                    fids.append(fi)
                    feats.append(f.tolist())
            yield pd.DataFrame({
                id_col: ids, "frame_id": fids, "feature": feats,
            })

    # NULL payloads (e.g. a page with NULL text cast to binary) are
    # skipped — bytes(None) would kill the whole stage on one bad row
    return df.select(id_col, binary_col).filter(
        F.col(binary_col).isNotNull()
    ).mapInPandas(
        run,
        schema=f"{id_col} string, frame_id int, feature array<double>",
    )


def decode_audio(df: DataFrame, binary_col: str = "html",
                 id_col: str = "url", codec=FakeCodec) -> DataFrame:
    """Audio-style payloads → (id, duration_s, rms, peak): the FakeCodec
    synthesizes a deterministic PCM buffer from the bytes; a real ffmpeg-
    backed codec drops into the same batch signature."""

    def run(batches):
        for pdf in batches:
            ids, dur, rms, peak = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                h = hashlib.md5(b).digest()
                n = 256 + h[0] * 8  # fake sample count
                rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
                pcm = rng.standard_normal(n) * (0.1 + h[1] / 512.0)
                ids.append(rid)
                dur.append(n / 16000.0)
                rms.append(float(np.sqrt((pcm * pcm).mean())))
                peak.append(float(np.abs(pcm).max()))
            yield pd.DataFrame({
                id_col: ids, "duration_s": dur, "rms": rms, "peak": peak,
            })

    # NULL payloads (e.g. a page with NULL text cast to binary) are
    # skipped — bytes(None) would kill the whole stage on one bad row
    return df.select(id_col, binary_col).filter(
        F.col(binary_col).isNotNull()
    ).mapInPandas(
        run,
        schema=f"{id_col} string, duration_s double, rms double, "
               f"peak double",
    )


def decode_audio_real(df: DataFrame, binary_col: str = "html",
                      id_col: str = "url") -> DataFrame:
    """REAL audio decode for RIFF/WAVE PCM16 (pure-stdlib parser in
    webtext/codecs.py): (id, n_samples, channels, sample_rate,
    duration_s, rms, peak).  Compressed audio (mp3/aac/...) raises
    `RealCodecUnavailable` inside the batch — those need ffmpeg."""
    from .codecs import decode_wav

    def run(batches):
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                pcm, rate = decode_wav(bytes(payload))
                x = pcm.astype(np.float64)
                out.append((
                    rid, pcm.shape[0], pcm.shape[1], rate,
                    pcm.shape[0] / rate,
                    float(np.sqrt((x * x).mean())),
                    float(np.abs(x).max()) if x.size else 0.0,
                ))
            yield pd.DataFrame(
                out, columns=[id_col, "n_samples", "channels",
                              "sample_rate", "duration_s", "rms",
                              "peak"],
            )

    return df.select(id_col, binary_col).filter(
        F.col(binary_col).isNotNull()
    ).mapInPandas(
        run,
        schema=f"{id_col} string, n_samples long, channels int, "
               f"sample_rate int, duration_s double, rms double, "
               f"peak double",
    )


def decode_images_real(df: DataFrame, **kw) -> DataFrame:
    """`decode_images` with the REAL pure-stdlib codec (webtext/codecs.py):
    PPM/PGM, 24-bit BMP and 8-bit PNG decode end-to-end in this
    container; JPEG/GIF/video payloads raise `RealCodecUnavailable`
    inside the batch (those need libjpeg/ffmpeg)."""
    from .codecs import StdlibCodec

    kw.setdefault("codec", StdlibCodec)
    return decode_images(df, **kw)
