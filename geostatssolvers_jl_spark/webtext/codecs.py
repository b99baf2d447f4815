"""Pure-stdlib media codecs: PPM/PGM, BMP (24-bit BI_RGB), PNG (zlib),
WAV (RIFF PCM16) and Y4M (YUV4MPEG2) video.  Every format is public
knowledge (Netpbm spec; Windows BITMAPINFOHEADER; RFC 2083 / the W3C
PNG spec; RIFF/WAVE; the YUV4MPEG2 header ffmpeg pipes) and needs
nothing beyond ``zlib`` + ``struct`` — which makes the engine's
multimodal decode path REAL end-to-end in this container across all
three modalities for uncompressed/lossless inputs, leaving
`RealCodecUnavailable` only for the genuinely-absent compressed codecs
(JPEG/mp3/mp4, which require libjpeg/ffmpeg).

Image decoders return ``(h, w, 3) uint8`` RGB:

* PPM ``P6`` / PGM ``P5`` (binary, maxval ≤ 255; comments allowed);
* BMP: uncompressed 24-bit ``BI_RGB``, BITMAPINFOHEADER, top-down or
  bottom-up, 4-byte row padding, BGR→RGB reorder;
* PNG: bit depth 8, color types 0 (gray → replicated), 2 (RGB),
  3 (indexed via PLTE) and 6 (RGBA → alpha dropped), non-interlaced;
  all five scanline filters (None/Sub/Up/Average/Paeth) are
  unfiltered.

`decode_wav` returns ``((n, channels) int16, sample_rate)``;
`decode_y4m` returns per-frame (y, u, v) planes and
`StdlibCodec.frame_sample` samples evenly-spaced luma frames.

Encoders exist so tests and gate entries can GENERATE deterministic
payloads executor-side and round-trip them:  ``encode_png`` cycles the
row filter 0→4 so a round-trip exercises every unfilter branch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .multimodal import FakeCodec, RealCodecUnavailable

# ---------------------------------------------------------------- PPM/PGM


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _pnm_tokens(buf: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers, skipping ``#``
    comments, returning (values, offset past the single whitespace byte
    that terminates the last token — the Netpbm header/raster border)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i] == 0x23:  # '#' comment to EOL
            while i < len(buf) and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(buf[i:j]))
        i = j
    # exactly ONE whitespace character terminates the header per the
    # Netpbm spec; tolerate the common Windows-authored CRLF as one
    # terminator (otherwise the '\n' would be read as the first raster
    # byte and every pixel silently shifts)
    if buf[i : i + 2] == b"\r\n":
        return vals, i + 2
    return vals, i + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _pnm_tokens(payload, 2, 3)
    if maxval <= 0 or maxval > 255:
        raise RealCodecUnavailable("PNM maxval > 255 (16-bit) unsupported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(payload, np.uint8, count=need, offset=off)
    img = raster.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img.copy()


# ------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, padded)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise RealCodecUnavailable("BMP core-header variant unsupported")
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or comp != 0:
        raise RealCodecUnavailable(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})"
        )
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=h * stride, offset=off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img.copy() if topdown else img[::-1].copy()


# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, color_type: int = 2) -> bytes:
    """uint8 image → PNG.  ``color_type``: 0 gray (takes (h,w) or the
    red channel), 2 RGB, 3 indexed (PLTE built from the image's ≤256
    distinct colors), 6 RGBA (alpha=255).  The row FILTER cycles
    0,1,2,3,4 so a decode round-trip exercises every unfilter branch."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1 and color_type in (2, 3, 6):
        # gray input under an RGB-family color type: replicate channels
        # (the alternative was an opaque reshape error downstream)
        img = np.repeat(img, 3, axis=2)
    h, w = img.shape[:2]
    plte = b""
    if color_type == 0:
        px, ch = img[:, :, :1], 1
    elif color_type == 3:
        flat = img[:, :, :3].reshape(-1, 3)
        pal, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(
                f"indexed PNG needs <= 256 distinct colors, image has "
                f"{len(pal)}"
            )
        plte = pal.astype(np.uint8).tobytes()
        px, ch = idx.astype(np.uint8).reshape(h, w, 1), 1
    elif color_type == 2:
        px, ch = img[:, :, :3], 3
    elif color_type == 6:
        px = np.concatenate(
            [img[:, :, :3],
             np.full((h, w, 1), 255, np.uint8)], axis=2)
        ch = 4
    else:
        raise ValueError(f"unsupported encoder color type {color_type}")
    raw = px.astype(np.uint8).reshape(h, w * ch).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * ch, np.int16)
    for y in range(h):
        row = raw[y]
        ftype = y % 5
        left = np.concatenate((np.zeros(ch, np.int16), row[:-ch]))
        upleft = np.concatenate((np.zeros(ch, np.int16), prev[:-ch]))
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth(left, prev, upleft)
        out.append(ftype)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    parts = [_PNG_SIG, _png_chunk(b"IHDR", ihdr)]
    if plte:
        parts.append(_png_chunk(b"PLTE", plte))
    parts += [_png_chunk(b"IDAT", zlib.compress(bytes(out), 6)),
              _png_chunk(b"IEND", b"")]
    return b"".join(parts)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §6.6) over int16 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), 0
    h = depth = ctype = interlace = 0
    idat = bytearray()
    plte = b""
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if interlace:
        raise RealCodecUnavailable("interlaced (Adam7) PNG unsupported")
    if depth != 8 or ctype not in (0, 2, 3, 6):
        raise RealCodecUnavailable(
            f"PNG depth={depth} color_type={ctype} unsupported "
            "(8-bit gray/indexed/RGB/RGBA only)"
        )
    if ctype == 3 and (not plte or len(plte) % 3):
        raise ValueError("indexed PNG is missing a valid PLTE chunk")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, rows = arr[:, 0], arr[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), np.int16)
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        row, ft = rows[y], int(ftypes[y])
        if ft == 0:
            cur = row.copy()
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters are a per-pixel recurrence; the
            # loop is over PIXELS of one row (≤ w) with vectorized
            # channel arithmetic — fine for thumbnails/fixtures, and
            # decoders are inherently per-payload inside the Arrow batch
            cur = np.zeros(stride, np.int16)
            for x in range(0, stride, ch):
                left = cur[x - ch : x] if x else np.zeros(ch, np.int16)
                up = prev[x : x + ch]
                upl = prev[x - ch : x] if x else np.zeros(ch, np.int16)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, upl)
                cur[x : x + ch] = (row[x : x + ch] + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max()) >= len(pal):
            raise ValueError("indexed PNG references past the palette")
        return pal[idx]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


# ------------------------------------------------------------ dispatcher


class StdlibCodec:
    """Real decoder for the stdlib-decodable raster formats, with the
    same surface as `FakeCodec` so it drops straight into
    `decode_images` / `image_features`.  Format is sniffed from magic
    bytes; JPEG/GIF/WEBP/video raise `RealCodecUnavailable` (those need
    libjpeg/ffmpeg, absent in this container)."""

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        if payload[:2] in (b"P6", b"P5"):
            return decode_pnm(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[: len(_PNG_SIG)] == _PNG_SIG:
            return decode_png(payload)
        magic = payload[:4].hex()
        raise RealCodecUnavailable(
            f"unrecognized or compressed-codec payload (magic {magic}); "
            "stdlib decoding covers PPM/PGM, 24-bit BMP and 8-bit PNG"
        )

    # nearest-neighbour resize and the video stub are format-independent
    resize = staticmethod(FakeCodec.resize)

    @staticmethod
    def frame_sample(payload: bytes, n_frames: int):
        """Evenly-spaced frame sampling for Y4M streams (the public
        uncompressed video format; see `decode_y4m`).  Frames come back
        as (h, w, 3) gray RGB from the luma plane — chroma is carried
        by `decode_y4m` for callers that want it; compressed video
        (mp4/webm/...) still needs ffmpeg and raises."""
        if not payload.startswith(b"YUV4MPEG2"):
            raise RealCodecUnavailable(
                "compressed-video frame sampling needs ffmpeg (not in "
                "this container); stdlib decoding covers Y4M"
            )
        frames, _w, _h, _fps = decode_y4m(payload)
        if not frames:
            raise ValueError("Y4M stream contains no frames")
        idx = np.linspace(0, len(frames) - 1, n_frames).astype(int)
        return [np.repeat(frames[i][0][:, :, None], 3, axis=2)
                for i in idx]


# ------------------------------------------------------------------- WAV


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 PCM → RIFF/WAVE (PCM format 1).  ``pcm``: (n,) mono or
    (n, channels)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n, channels) int16, sample_rate).  Chunk-walk
    parser (fmt /data in any order, unknown chunks skipped, word-aligned
    sizes); float/compressed WAV raises `RealCodecUnavailable`."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        # unknown magic = some other (typically compressed) codec — the
        # same boundary StdlibCodec.decode draws for images
        raise RealCodecUnavailable(
            "not a RIFF/WAVE payload; compressed audio (mp3/aac/...) "
            "needs ffmpeg, which is not in this container"
        )
    pos = 12
    rate = ch = bits = afmt = 0
    data = b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            # fail loud on truncation (a half-downloaded file would
            # otherwise silently decode to half the samples)
            raise ValueError(
                f"WAV chunk {tag!r} declares {ln} bytes but only "
                f"{len(body)} remain"
            )
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            afmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif tag == b"data":
            data = body
    if afmt != 1 or bits != 16:
        raise RealCodecUnavailable(
            f"only PCM16 WAV supported (format={afmt}, bits={bits})"
        )
    if not rate or not ch or not data:
        raise ValueError("WAV is missing fmt/data chunks")
    pcm = np.frombuffer(data, "<i2")
    return pcm.reshape(-1, ch).copy(), rate


# ---------------------------------------------------- Y4M (YUV4MPEG2)


def encode_y4m(frames, fps: int = 25) -> bytes:
    """List of (y, u, v) planes — y: (h, w) uint8, u/v: (h/2, w/2) —
    → YUV4MPEG2 stream (4:2:0 planar, the format ffmpeg pipes)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0][0].shape
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n"
                    % (w, h, fps))
    for y, u, v in frames:
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) \
                or v.shape != (h // 2, w // 2):
            raise ValueError("inconsistent plane shapes")
        out += b"FRAME\n"
        out += np.asarray(y, np.uint8).tobytes()
        out += np.asarray(u, np.uint8).tobytes()
        out += np.asarray(v, np.uint8).tobytes()
    return bytes(out)


def decode_y4m(payload: bytes):
    """YUV4MPEG2 (C420, 8-bit) → (frames, w, h, fps) with frames a list
    of (y, u, v) uint8 planes.  Only the parameters the stream header
    declares are honoured; non-420 chroma raises
    `RealCodecUnavailable`."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = 0
    fps = 25
    chroma = b"420"
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            fps = int(val.split(b":")[0])
        elif key == b"C":
            chroma = val
    if not chroma.startswith(b"420"):
        raise RealCodecUnavailable(
            f"only C420 Y4M supported (got C{chroma.decode()})"
        )
    if w <= 0 or h <= 0 or w % 2 or h % 2:
        raise ValueError("Y4M needs positive even W/H for 4:2:0")
    ysz, csz = w * h, (w // 2) * (h // 2)
    fsz = ysz + 2 * csz
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        pos = fnl + 1
        raw = np.frombuffer(payload, np.uint8, count=fsz, offset=pos)
        frames.append((
            raw[:ysz].reshape(h, w).copy(),
            raw[ysz : ysz + csz].reshape(h // 2, w // 2).copy(),
            raw[ysz + csz :].reshape(h // 2, w // 2).copy(),
        ))
        pos += fsz
    return frames, w, h, fps
