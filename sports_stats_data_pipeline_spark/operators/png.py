"""Minimal pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only) —
the vendored fallback that makes :func:`multimodal.real_decode_pixels`
executable in environments without pillow (this container).

Scope (deliberately small, spec-complete within it):
- decode: 8-bit-depth, non-interlaced PNGs of color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline
  filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). Anything else
  raises ``ValueError`` — callers treat that as a malformed row (P6).
- encode: 8-bit grayscale, any single filter type applied to every row
  (the test fixture generator; exercising each filter's decode path).
- grayscale reduction uses the ITU-R 601-2 integer weights
  ``(299·R + 587·G + 114·B) // 1000`` — pillow's formula for
  ``convert("L")`` up to last-unit rounding; alpha is ignored.

Per-pixel Python loops are fine HERE because decode runs inside
mapInPandas on thumbnail-scale assets; a production 100 TB media
pipeline swaps this backend for a real codec (pillow/ffmpeg) without
touching the operator shape (binary in, pixel grid out).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type.
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: hard cap on decoded sample bytes (w * bpp * h). Untrusted rows must
#: not be able to allocate unbounded memory on an executor: this module
#: decodes thumbnail-scale assets, and a 64 MiB grid is far above any
#: legitimate fixture while far below executor heap. Checked BEFORE any
#: decompression happens, so a tiny-IHDR/huge-IDAT bomb never inflates.
MAX_DECODED_BYTES = 64 * 1024 * 1024


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters into raw sample bytes."""
    stride = w * bpp
    out = bytearray(stride * h)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ft == 0:
            out[base : base + stride] = line
        elif ft == 1:  # Sub
            for i, v in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                out[base + i] = (v + left) & 0xFF
        elif ft == 2:  # Up
            for i, v in enumerate(line):
                up = out[prev + i] if y > 0 else 0
                out[base + i] = (v + up) & 0xFF
        elif ft == 3:  # Average
            for i, v in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                up = out[prev + i] if y > 0 else 0
                out[base + i] = (v + (left + up) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i, v in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                up = out[prev + i] if y > 0 else 0
                ul = out[prev + i - bpp] if (y > 0 and i >= bpp) else 0
                out[base + i] = (v + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return out


def decode_png(data: bytes) -> tuple[int, int, list[int]]:
    """Decode ``data`` to ``(width, height, grayscale_pixels_row_major)``.
    Raises ``ValueError`` for non-PNG bytes, unsupported variants, and
    corrupt streams (zlib/structure errors are normalized to ValueError
    so callers have ONE malformed-row signal)."""
    try:
        return _decode_png(data)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e


def _decode_png(data: bytes) -> tuple[int, int, list[int]]:
    if bytes(data[:8]) != PNG_SIGNATURE:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC (not verified — decode, not validate)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} interlace={interlace}"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if w < 1 or h < 1:
        raise ValueError(f"bad dimensions {w}x{h}")
    bpp = _CHANNELS[color_type]
    if w * bpp * h > MAX_DECODED_BYTES:
        raise ValueError(f"PNG dimensions {w}x{h} exceed decode cap")
    expected = (w * bpp + 1) * h
    # Bounded inflate: never allocate more than expected+1 bytes of
    # output, whatever the compressed stream claims. A crafted IDAT
    # that would expand past the IHDR-derived size (a zip bomb) is cut
    # off at expected+1 and rejected by the length check below, instead
    # of materializing the full expansion first.
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected + 1)
    # the eof check preserves plain zlib.decompress's completeness
    # verification: a TRUNCATED deflate stream that happens to emit
    # exactly `expected` bytes before being cut off (no stream-end
    # marker) must still read as corrupt, not decode as valid
    if (
        len(raw) != expected
        or dobj.unconsumed_tail
        or dobj.decompress(b"", 1)
        or not dobj.eof
    ):
        raise ValueError("IDAT size does not match dimensions")
    samples = _unfilter(raw, w, h, bpp)

    px: list[int] = []
    if color_type == 0:
        px = list(samples)
    elif color_type == 4:  # gray + alpha: keep gray
        px = list(samples[0::2])
    elif color_type in (2, 6):
        step = bpp
        for i in range(0, len(samples), step):
            r, g, b = samples[i], samples[i + 1], samples[i + 2]
            px.append((299 * r + 587 * g + 114 * b) // 1000)
    elif color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        for i in samples:
            r, g, b = palette[3 * i], palette[3 * i + 1], palette[3 * i + 2]
            px.append((299 * r + 587 * g + 114 * b) // 1000)
    return w, h, px


def _filter_line(
    ft: int, line: bytes, prev: bytes | None, bpp: int
) -> bytes:
    out = bytearray()
    for i, v in enumerate(line):
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i] if prev is not None else 0
        ul = prev[i - bpp] if (prev is not None and i >= bpp) else 0
        if ft == 0:
            out.append(v)
        elif ft == 1:
            out.append((v - left) & 0xFF)
        elif ft == 2:
            out.append((v - up) & 0xFF)
        elif ft == 3:
            out.append((v - (left + up) // 2) & 0xFF)
        elif ft == 4:
            out.append((v - _paeth(left, up, ul)) & 0xFF)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: list[list[int]] | list[int],
    width: int | None = None,
    filter_type: int = 0,
) -> bytes:
    """Encode an 8-bit grayscale image (rows of 0-255 ints, or a flat
    row-major list + ``width``) as a valid PNG, applying ``filter_type``
    to every scanline — the fixture generator for the decoder tests."""
    if width is not None:
        flat = list(pixels)  # type: ignore[arg-type]
        if width < 1 or len(flat) % width:
            raise ValueError("flat pixel list does not tile into rows")
        rows = [flat[i : i + width] for i in range(0, len(flat), width)]
    else:
        rows = [list(r) for r in pixels]  # type: ignore[union-attr]
    if not rows or not rows[0]:
        raise ValueError("empty image")
    h, w = len(rows), len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    raw = bytearray()
    prev: bytes | None = None
    for r in rows:
        line = bytes(r)
        raw.append(filter_type)
        raw.extend(_filter_line(filter_type, line, prev, bpp=1))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
