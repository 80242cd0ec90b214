#!/usr/bin/env python3
"""Author the multimodal ground-truth fixture (q54's oracle sidecar).

Writes two parquet files under fixtures/media/:
  media.parquet  — media_id, media_type, format, content (real encoded
                   PNG / BMP / WAV / AVI-DIB bytes, written from scratch
                   here with struct+zlib — no imaging library, no shared
                   code with the engine's JDK decoders)
  truth.parquet  — the EXPECTED decode results (width, height,
                   duration_ms, n_units, lum_sum, lum_hash), computed
                   from the pixel/sample values CHOSEN at authoring time,
                   never by decoding. All four container formats are
                   lossless, so the engine's decode must reproduce these
                   numbers bit-for-bit; q54's DuckDB oracle reads this
                   sidecar and the driver hash-compares.

Format references (public): PNG — RFC 2083; BMP/DIB — MSDN BITMAPINFOHEADER;
WAV — RIFF/WAVE PCM; AVI — MSDN "AVI RIFF File Reference".

Deterministic: seeded random.Random(4242). Regenerate with
  python3 tools/make_media_fixtures.py
and commit the two parquet files.
"""
import random
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = "fixtures/media"
MASK64 = (1 << 64) - 1


def lum(r, g, b):
    """ITU-R BT.601 integer luminance — the published formula both this
    generator and any correct decoder arrive at independently."""
    return (r * 299 + g * 587 + b * 114) // 1000


def digest(lums):
    """h = 1; h = h*31 + v over the luminance/sample byte sequence,
    64-bit wraparound, returned as signed (Spark LongType semantics)."""
    h = 1
    for v in lums:
        h = (h * 31 + v) & MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


# --- encoders (from scratch) -------------------------------------------------

def png_bytes(w, h, px):
    """8-bit RGB PNG, no filter, one IDAT. px = row-major [(r,g,b)]."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for x in range(w) for v in px[y * w + x])
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def dib_rows(w, h, px):
    """Bottom-up 24bpp BGR rows padded to 4-byte stride (the on-disk DIB
    pixel layout shared by BMP files and AVI '00db' frames)."""
    stride_pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytes(v for x in range(w)
                    for v in (px[y * w + x][2], px[y * w + x][1], px[y * w + x][0]))
        rows.append(row + stride_pad)
    return b"".join(rows)


def bmp_bytes(w, h, px):
    body = dib_rows(w, h, px)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body


def wav_bytes(samples, rate=8000):
    """16-bit signed little-endian mono PCM."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + len(fmt) + 8 + len(data)) + b"WAVE"
            + fmt + b"data" + struct.pack("<I", len(data)) + data)


def avi_bytes(w, h, fps, frame_pxs):
    """Uncompressed-DIB AVI: RIFF(AVI  LIST(hdrl avih LIST(strl strh strf))
    LIST(movi 00db…)). DIB frames decode with integer math — lossless."""
    def chunk(tag, data):
        return tag + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    def lst(tp, data):
        return chunk(b"LIST", tp + data)

    uspf = 1000000 // fps
    avih = struct.pack("<8I", uspf, 0, 0, 0, len(frame_pxs), 0, 1, 0) \
        + struct.pack("<II", w, h) + b"\x00" * 16
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIII", 0, 0, 0, 0, 1, fps)
            + struct.pack("<IIIi", 0, len(frame_pxs), 0, -1)
            + struct.pack("<IHHHH", 0, 0, 0, w, h))
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + struct.pack("<IIiiII", 0, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib_rows(w, h, px)) for px in frame_pxs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- corpus ------------------------------------------------------------------

def main():
    rnd = random.Random(4242)
    media, truth = [], []

    def add(mid, mtype, fmt, content, width, height, duration_ms, lums):
        media.append((mid, mtype, fmt, content))
        truth.append((mid, mtype, width, height, duration_ms,
                      len(lums), sum(lums), digest(lums)))

    mid = 0
    for fmt in ("png", "bmp"):
        for _ in range(20):
            w, h = 5 + rnd.randrange(28), 5 + rnd.randrange(28)
            px = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
                  for _ in range(w * h)]
            content = png_bytes(w, h, px) if fmt == "png" else bmp_bytes(w, h, px)
            add(mid, "image", fmt, content, w, h, 0,
                [lum(r, g, b) for (r, g, b) in px])
            mid += 1
    for _ in range(40):
        n = 400 + rnd.randrange(1600)
        samples = [rnd.randrange(-32768, 32768) for _ in range(n)]
        # decoder contract: 8-bit view = high byte of the 16-bit sample,
        # re-biased to center 128
        add(mid, "audio", "wav", wav_bytes(samples), 0, 0, n * 1000 // 8000,
            [(((s & 0xFFFF) >> 8) ^ 0x80) for s in samples])
        mid += 1
    for _ in range(40):
        w, h, fps = 9 + rnd.randrange(12), 9 + rnd.randrange(12), 5
        frames = [[(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
                   for _ in range(w * h)] for _ in range(2 + rnd.randrange(9))]
        lums = [lum(r, g, b) for px in frames for (r, g, b) in px]
        add(mid, "video", "avi-dib", avi_bytes(w, h, fps, frames),
            w, h, len(frames) * (1000000 // fps) // 1000, lums)
        mid += 1
    # corrupt class: bytes no decoder recognizes. The engine's decode
    # contract is all-zero digests (empty luminance stream, hash seed 1)
    # — authored here as truth so the DEGRADE path is oracle-checked,
    # not just never exercised.
    for _ in range(5):
        content = bytes(rnd.randrange(256) for _ in range(200 + rnd.randrange(300)))
        add(mid, "image", "corrupt", content, 0, 0, 0, [])
        mid += 1
    for _ in range(5):
        content = b"RIFF" + bytes(rnd.randrange(256) for _ in range(100))
        add(mid, "video", "corrupt", content, 0, 0, 0, [])
        mid += 1

    import os
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(pa.table({
        "media_id": pa.array([m[0] for m in media], pa.int64()),
        "media_type": pa.array([m[1] for m in media], pa.string()),
        "format": pa.array([m[2] for m in media], pa.string()),
        "content": pa.array([m[3] for m in media], pa.binary()),
    }), f"{OUT}/media.parquet")
    pq.write_table(pa.table({
        "media_id": pa.array([t[0] for t in truth], pa.int64()),
        "media_type": pa.array([t[1] for t in truth], pa.string()),
        "width": pa.array([t[2] for t in truth], pa.int64()),
        "height": pa.array([t[3] for t in truth], pa.int64()),
        "duration_ms": pa.array([t[4] for t in truth], pa.int64()),
        "n_units": pa.array([t[5] for t in truth], pa.int64()),
        "lum_sum": pa.array([t[6] for t in truth], pa.int64()),
        "lum_hash": pa.array([t[7] for t in truth], pa.int64()),
    }), f"{OUT}/truth.parquet")
    print(f"wrote {len(media)} media items + truth to {OUT}/")


if __name__ == "__main__":
    main()
