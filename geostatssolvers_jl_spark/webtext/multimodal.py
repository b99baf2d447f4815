"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED — this container ships no image/audio codecs —
behind `FakeCodec` (a deterministic stand-in) and `RealCodecUnavailable`.
Everything Spark-side is real and tested: schema, Arrow batch shape,
partitioning, and the `mapInPandas` UDF signatures a real decoder would
drop into (swap `FakeCodec.decode` for PIL/ffmpeg on a cluster with the
libs installed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


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

    return df.select(id_col, binary_col).mapInPandas(
        run,
        schema=f"{id_col} string, width int, height int, n_bytes long, "
               f"thumb_md5 string",
    )


def decode_images_real(df: DataFrame, **_) -> DataFrame:
    raise RealCodecUnavailable(
        "image/audio codecs are not installed in this container; use "
        "decode_images(codec=FakeCodec) for plumbing tests and swap in a "
        "PIL/ffmpeg-backed codec on a real cluster"
    )
