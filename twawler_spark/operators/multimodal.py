"""Multimodal columns: opaque binary payloads + typed metadata.

Reference: profilepics.py:30-90 (S10) wgets avatar images and records
them in the ``images`` collection. Here media is an opaque ``binary``
column travelling WITH the row (the interleaved-span model carries a
``media_ref`` per span; this module is the side table those refs point
into), and per-modality processing runs as Arrow-batched ``mapInPandas``
— the Spark-side plumbing (schema, batching, partitioning) is real, and
so are all three decode tiers: payloads are genuine uncompressed
formats constructible and decodable from bytes alone with no codec
library — 24-bit BMP images, PCM16 RIFF/WAVE audio, and RIFF/AVI video
with DIB frames — so the decoders do real header parsing, chunk-tree
walks, and numpy pixel/sample reduction.

  attach_media         synthesize/attach binary payloads (deterministic)
  attach_bmp_media     real 24-bit BMP payload per row (id-derived dims)
  attach_wav_media     real PCM16 WAV payload per row (id-derived)
  attach_avi_media     real uncompressed AVI payload per row (id-derived)
  make_bmp / make_wav / make_avi    build real files from bytes alone
  extract_metadata     mapInPandas: bytes -> (kind, n_bytes, sha-like id,
                       width/height/duration stub fields)
  decode_image         REAL BMP decode: headers, padding, per-channel
                       means via numpy in Arrow-batched mapInPandas
  decode_audio         REAL PCM decode: RIFF chunk walk, de-interleave
  decode_video         REAL AVI decode: one row per DIB frame
  frame_sample         video -> frame index plan (pure DataFrame op)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, content_id string, "
    "width int, height int, duration_ms int"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic opaque payload per row + a typed kind column."""
    kind = (
        F.when(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(3)) == 0, "image")
        .when(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_ref"),
        kind.alias("media_kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_metadata(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``fake_decode=True`` derives deterministic width/height/duration
    from the payload hash (the codec stand-in); ``False`` raises in the
    decode step, which is the honest no-codec-in-sandbox behavior.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image/audio decode needs PIL/ffmpeg — not in sandbox"
                )
            digests = [hashlib.sha1(b).hexdigest() for b in pdf["payload"]]
            seeds = [int(d[:8], 16) for d in digests]
            is_img = pdf["media_kind"] == "image"
            is_vid = pdf["media_kind"] == "video"
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "content_id": digests,
                    "width": [
                        (64 + s % 1920) if (i or v) else 0
                        for s, i, v in zip(seeds, is_img, is_vid)
                    ],
                    "height": [
                        (64 + (s >> 8) % 1080) if (i or v) else 0
                        for s, i, v in zip(seeds, is_img, is_vid)
                    ],
                    "duration_ms": [
                        (1000 + s % 600000) if not i else 0
                        for s, i in zip(seeds, is_img)
                    ],
                }
            )
            yield out.astype(
                {"n_bytes": "int64", "width": "int32", "height": "int32",
                 "duration_ms": "int32"}
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def make_bmp(width: int, height: int, r: int, g: int, b: int) -> bytes:
    """Uncompressed 24-bit BMP, constant fill color — a REAL image file
    (Windows BITMAPINFOHEADER, bottom-up BGR rows, 4-byte row padding)
    built from bytes alone, so the sandbox needs no codec library."""
    import struct

    row = bytes((b, g, r)) * width
    pad = (-len(row)) % 4
    row += b"\x00" * pad
    pixels = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


DECODE_SCHEMA = (
    "media_ref string, width int, height int, "
    "mean_r long, mean_g long, mean_b long, n_bytes long"
)


def decode_bmp_bytes(buf: bytes) -> tuple[int, int, int, int, int]:
    """Pure decoder for one uncompressed 24-bit BMP: returns (width,
    height, mean_r, mean_g, mean_b) with exact integer means. Parses
    both headers, strips per-row padding, splits BGR planes in numpy —
    property-tested without Spark (tests/test_operators.py)."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * abs(h), offset=offset
    ).reshape(abs(h), stride)[:, : 3 * w]
    px = rows.reshape(-1, 3).astype(np.int64)  # BGR
    n_px = abs(h) * w
    return (
        w,
        abs(h),
        int(px[:, 2].sum()) // n_px,
        int(px[:, 1].sum()) // n_px,
        int(px[:, 0].sum()) // n_px,
    )


def decode_image(media: DataFrame) -> DataFrame:
    """Real pixel decode for uncompressed 24-bit BMP payloads: parse the
    two headers, strip per-row padding, split BGR planes, and reduce to
    per-channel means — numpy inside Arrow-batched ``mapInPandas`` (the
    mean is an exact integer division so no float crosses the wire).

    This replaces the r2 NotImplementedError stub: the synthetic media
    IS a decodable format now, so the operator exercises the same
    byte-parsing work a PIL/ffmpeg decode would, with zero external
    codecs. Reference analog: profilepics.py:30-90 fetches avatar
    images; this is the column-native processing tier over them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, mr, mg, mb, nb = [], [], [], [], [], [], []
            for ref, buf in zip(pdf["media_ref"], pdf["payload"]):
                buf = bytes(buf)
                w, h, r, g, b = decode_bmp_bytes(buf)
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                mr.append(r)
                mg.append(g)
                mb.append(b)
                nb.append(len(buf))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "mean_r": pd.array(mr, dtype="int64"),
                    "mean_g": pd.array(mg, dtype="int64"),
                    "mean_b": pd.array(mb, dtype="int64"),
                    "n_bytes": pd.array(nb, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


def attach_bmp_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-BMP payload per row: dimensions and fill color
    derive from the id (odd widths exercise BMP row padding), so an
    oracle can predict every decoded stat from id arithmetic alone."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": ids.astype(str),
                    "payload": [
                        make_bmp(
                            5 + int(i) % 16,
                            4 + int(i) % 8,
                            int(i) % 256,
                            int(i) * 7 % 256,
                            int(i) * 13 % 256,
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema="media_ref string, payload binary")


def frame_sample(meta: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure DataFrame op (sequence + explode), ready to feed a decoder."""
    vids = meta.where(F.col("media_kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )


def make_wav(sample_rate: int, channels: list[list[int]]) -> bytes:
    """Uncompressed PCM16 WAV from bytes alone (RIFF + fmt + data
    chunks, interleaved little-endian int16 frames) — the audio twin of
    make_bmp: a REAL audio file with no codec library."""
    import struct

    import numpy as np

    nch = len(channels)
    frames = np.stack(
        [np.asarray(c, dtype=np.int16) for c in channels], axis=1
    )  # (n_samples, nch) interleave
    data = frames.tobytes()
    byte_rate = sample_rate * nch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, nch, sample_rate, byte_rate, nch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav_bytes(buf: bytes):
    """Pure decoder for one PCM16 WAV: walks the RIFF chunk list,
    validates the fmt chunk (PCM, 16-bit), de-interleaves channels in
    numpy. Returns (n_channels, sample_rate, n_samples, duration_ms,
    mean_c0, peak_c0, mean_c1, peak_c1) — means are exact integer
    divisions; mono files report 0 for the second channel."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, nch, rate, data = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported, got tag={tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if nch is None or data is None:
        raise ValueError("missing fmt/data chunk")
    frames = np.frombuffer(data, dtype="<i2").reshape(-1, nch).astype(np.int64)
    n = frames.shape[0]
    dur_ms = n * 1000 // rate

    def stats(c):
        if c >= nch:
            return 0, 0
        col = frames[:, c]
        return int(col.sum()) // n, int(np.abs(col).max())

    m0, p0 = stats(0)
    m1, p1 = stats(1)
    return nch, rate, n, dur_ms, m0, p0, m1, p1


AUDIO_SCHEMA = (
    "media_ref string, n_channels int, sample_rate int, n_samples long, "
    "duration_ms long, mean_c0 long, peak_c0 long, mean_c1 long, peak_c1 long"
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Real PCM decode over the binary audio column — RIFF chunk walk,
    fmt validation, numpy channel de-interleave and per-channel
    mean/peak reduction inside Arrow-batched mapInPandas. Replaces the
    metadata-only audio stub: the synthetic payloads are genuine WAV
    files, so this exercises the same byte-level work an ffmpeg/soundfile
    decode would."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, buf in zip(pdf["media_ref"], pdf["payload"]):
                rows.append((ref, *decode_wav_bytes(bytes(buf))))
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "n_channels", "sample_rate", "n_samples",
                    "duration_ms", "mean_c0", "peak_c0", "mean_c1", "peak_c1",
                ],
            )
            yield out.astype(
                {"n_channels": "int32", "sample_rate": "int32",
                 "n_samples": "int64", "duration_ms": "int64",
                 "mean_c0": "int64", "peak_c0": "int64",
                 "mean_c1": "int64", "peak_c1": "int64"}
            )

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


def attach_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-WAV payload per row: channel count, length and
    ramp amplitudes all derive from the id (odd ids are stereo,
    exercising de-interleave), so an oracle predicts every decoded stat
    from id arithmetic alone. Channel c sample i = base_c + i (a ramp —
    sums and peaks stay exact integers)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n = 50 + i % 64
                chans = [[(i % 500) + s for s in range(n)]]
                if i % 2 == 1:
                    chans.append([(i * 17 % 500) + s for s in range(n)])
                payloads.append(make_wav(8000, chans))
            yield pd.DataFrame(
                {"media_ref": ids.astype(str), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(gen, schema="media_ref string, payload binary")


AUDIT_SCHEMA = "media_ref string, status string, n_bytes long"


def audit_media(media: DataFrame) -> DataFrame:
    """checkimages.py:15-33 analog — payload audit over the binary
    column: 'missing' (NULL payload), 'corrupt' (decoder raises on the
    bytes), 'ok'. The tolerant decode runs the REAL BMP parser per row
    inside Arrow-batched mapInPandas; at warehouse scale this is the
    integrity sweep that runs after every media ingest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, buf in zip(pdf["media_ref"], pdf["payload"]):
                if buf is None:
                    rows.append((ref, "missing", 0))
                    continue
                import struct

                buf = bytes(buf)
                try:
                    decode_bmp_bytes(buf)
                    rows.append((ref, "ok", len(buf)))
                except (ValueError, IndexError, struct.error):
                    rows.append((ref, "corrupt", len(buf)))
            out = pd.DataFrame(rows, columns=["media_ref", "status", "n_bytes"])
            yield out.astype({"n_bytes": "int64"})

    return media.mapInPandas(run, schema=AUDIT_SCHEMA)


def make_avi(width: int, height: int, fps: int, colors: list[tuple[int, int, int]]) -> bytes:
    """Uncompressed AVI (RIFF 'AVI ': hdrl[avih + strl[strh 'vids'/'DIB '
    + strf BITMAPINFOHEADER]] + movi['00db' DIB frames]) built from
    bytes alone — the video twin of make_bmp/make_wav: a REAL video
    container with no codec library. One constant-fill 24-bit BGR frame
    per entry in ``colors`` (bottom-up rows, 4-byte stride padding,
    exactly the BMP pixel layout)."""
    import struct

    stride = (3 * width + 3) // 4 * 4
    frames = []
    for r, g, b in colors:
        row = bytes((b, g, r)) * width + b"\x00" * (stride - 3 * width)
        frames.append(row * height)
    frame_size = stride * height
    n = len(colors)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" * (len(body) & 1))

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI4s", b"LIST", 4 + len(body), kind) + body

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi_bytes(buf: bytes):
    """Pure decoder for one uncompressed AVI: walks the RIFF chunk tree
    (hdrl -> avih dims/fps/frame count, strl -> strh rate + strf bpp
    check; movi -> '00db' DIB frames), decodes every frame's pixels in
    numpy. Returns (width, height, fps, n_frames,
    [(mean_r, mean_g, mean_b) per frame]) with exact integer means —
    property-tested without Spark like its BMP/WAV siblings."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(data: bytes):
        pos = 0
        while pos + 8 <= len(data):
            cid, size = struct.unpack_from("<4sI", data, pos)
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                yield body[:4], body[4:], True
            else:
                yield cid, body, False
            pos += 8 + size + (size & 1)

    w = h = fps = n_frames = None
    bpp = None
    frames = []
    for kind, body, is_list in walk(buf[12:]):
        if kind == b"hdrl" and is_list:
            for k2, b2, l2 in walk(body):
                if k2 == b"avih":
                    usec, _, _, _, n_frames, _, _, _, w, h = struct.unpack_from(
                        "<IIIIIIIIII", b2, 0
                    )
                    fps = 1_000_000 // usec
                elif k2 == b"strl" and l2:
                    for k3, b3, _ in walk(b2):
                        if k3 == b"strh":
                            if b3[:4] != b"vids":
                                raise ValueError("first stream must be video")
                        elif k3 == b"strf":
                            bpp = struct.unpack_from("<H", b3, 14)[0]
                            if bpp != 24:
                                raise ValueError(f"only 24-bit DIB frames, got {bpp}")
        elif kind == b"movi" and is_list:
            stride = (3 * w + 3) // 4 * 4
            for k2, b2, _ in walk(body):
                if k2 != b"00db":
                    continue
                rows = np.frombuffer(
                    b2, dtype=np.uint8, count=stride * h
                ).reshape(h, stride)[:, : 3 * w]
                px = rows.reshape(-1, 3).astype(np.int64)  # BGR
                n_px = h * w
                frames.append(
                    (
                        int(px[:, 2].sum()) // n_px,
                        int(px[:, 1].sum()) // n_px,
                        int(px[:, 0].sum()) // n_px,
                    )
                )
    if w is None or bpp is None:
        raise ValueError("missing avih/strf header")
    if len(frames) != n_frames:
        raise ValueError(f"header says {n_frames} frames, movi has {len(frames)}")
    return w, h, fps, n_frames, frames


VIDEO_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int, fps int, "
    "n_frames int, mean_r long, mean_g long, mean_b long"
)


def decode_video(media: DataFrame) -> DataFrame:
    """Real frame extraction over the binary video column: RIFF tree
    walk, header validation, numpy DIB pixel decode — one output row
    per frame, inside Arrow-batched ``mapInPandas``. Completes the
    decode pattern a third time (image/audio/video): frame_sample's
    frame PLAN now has a decoder to feed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, buf in zip(pdf["media_ref"], pdf["payload"]):
                w, h, fps, n, frames = decode_avi_bytes(bytes(buf))
                for fi, (mr, mg, mb) in enumerate(frames):
                    rows.append((ref, fi, w, h, fps, n, mr, mg, mb))
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height", "fps",
                    "n_frames", "mean_r", "mean_g", "mean_b",
                ],
            )
            yield out.astype(
                {"frame_idx": "int32", "width": "int32", "height": "int32",
                 "fps": "int32", "n_frames": "int32", "mean_r": "int64",
                 "mean_g": "int64", "mean_b": "int64"}
            )

    return media.mapInPandas(run, schema=VIDEO_SCHEMA)


def attach_avi_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-AVI payload per row: dimensions, frame count
    and each frame's fill color derive from the id (odd widths exercise
    stride padding), so an oracle predicts every decoded frame stat
    from id arithmetic alone. Frame f of id i is filled with
    (r, g, b) = ((i + 31f) % 256, (7i + 53f) % 256, (13i + 11f) % 256)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                colors = [
                    ((i + 31 * f) % 256, (7 * i + 53 * f) % 256, (13 * i + 11 * f) % 256)
                    for f in range(2 + i % 4)
                ]
                payloads.append(make_avi(5 + i % 8, 4 + i % 4, 10, colors))
            yield pd.DataFrame(
                {"media_ref": ids.astype(str), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(gen, schema="media_ref string, payload binary")


# ------------------------------------------------- perceptual hash (dHash)

DHASH_BLOCKS_X = 8   # pooled grid width  -> 7 horizontal comparisons/row
DHASH_BLOCKS_Y = 8   # pooled grid height -> 56-bit hash (stays off int64 sign)
DHASH_BLOCK = 4      # source pixels per pooled cell edge (32x32 images)


def gradient_brightness(doc_id: int, bx: int, by: int) -> int:
    """The fixture's per-block brightness ramp — kept in [0, 192) so a
    +shift plant never wraps and therefore never reorders adjacent
    blocks. Shared by the builder, the test, and the SQL oracle."""
    return (13 * doc_id + 37 * bx + 59 * by) % 192


def make_gradient_bmp(doc_id: int, shift: int = 0) -> bytes:
    """Real 24-bit BMP with a block-gradient grayscale pattern: each
    DHASH_BLOCK-square cell is filled with gradient_brightness(...) +
    shift. ``by`` indexes STORED row order (BMPs are bottom-up; the
    hash is orientation-covariant as long as builder, decoder and
    oracle agree, so the stored order is the contract)."""
    import struct

    import numpy as np

    w = DHASH_BLOCKS_X * DHASH_BLOCK
    h = DHASH_BLOCKS_Y * DHASH_BLOCK
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(DHASH_BLOCKS_Y):
        for bx in range(DHASH_BLOCKS_X):
            img[
                by * DHASH_BLOCK : (by + 1) * DHASH_BLOCK,
                bx * DHASH_BLOCK : (bx + 1) * DHASH_BLOCK,
            ] = gradient_brightness(doc_id, bx, by) + shift
    rows = []
    stride_pad = (-(3 * w)) % 4
    for r in range(h):
        row = np.repeat(img[r], 3).tobytes()  # grayscale BGR
        rows.append(row + b"\x00" * stride_pad)
    pixels = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def dhash_bytes(buf: bytes) -> int:
    """Difference hash of one 24-bit BMP, from bytes alone: header
    parse, padding strip, DHASH_BLOCK-square mean pooling (exact
    integer division), then bit k = by*(BX-1)+j set iff pooled[by][j+1]
    > pooled[by][j]. Brightness-shift invariant by construction — the
    property the near-dup detector rides on."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : 3 * w]
    gray = rows.reshape(h, w, 3)[:, :, 0].astype(np.int64)  # B plane
    bh, bw = h // DHASH_BLOCK, w // DHASH_BLOCK
    pooled = (
        gray.reshape(bh, DHASH_BLOCK, bw, DHASH_BLOCK).sum(axis=(1, 3))
        // (DHASH_BLOCK * DHASH_BLOCK)
    )
    hash_val = 0
    for by in range(bh):
        for j in range(bw - 1):
            if pooled[by][j + 1] > pooled[by][j]:
                hash_val |= 1 << (by * (bw - 1) + j)
    return hash_val


def _make_gradient_bmp_batch(ids, shift: int = 0) -> list:
    """Batch twin of make_gradient_bmp: identical bytes, one numpy
    pipeline per Arrow batch instead of ~100 tiny numpy calls per image
    (guide §4.2). The scalar builder stays the readable spec (and the
    test surface); this produces byte-identical payloads."""
    import struct

    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    w = DHASH_BLOCKS_X * DHASH_BLOCK
    h = DHASH_BLOCKS_Y * DHASH_BLOCK
    bxs = np.arange(DHASH_BLOCKS_X, dtype=np.int64)
    bys = np.arange(DHASH_BLOCKS_Y, dtype=np.int64)
    bright = (
        13 * ids[:, None, None] + 37 * bxs[None, None, :] + 59 * bys[None, :, None]
    ) % 192 + shift
    imgs = (
        bright.astype(np.uint8)
        .repeat(DHASH_BLOCK, axis=1)
        .repeat(DHASH_BLOCK, axis=2)
    )  # (n, h, w) — same block fill as the scalar loop
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((len(ids), h, stride), dtype=np.uint8)
    rows[:, :, : 3 * w] = imgs[:, :, :, None].repeat(3, axis=3).reshape(
        len(ids), h, 3 * w
    )  # grayscale BGR + per-row stride padding, as the scalar builder
    n_pix = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + n_pix, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, n_pix, 2835, 2835, 0, 0
    )
    return [header + a.tobytes() for a in rows]


def attach_gradient_bmp_media(
    df: DataFrame, id_col: str = "doc_id", shift: int = 0, ref_suffix: str = ""
) -> DataFrame:
    """Deterministic gradient-BMP payload per row (optionally brightness-
    shifted + ref-suffixed: the near-dup plant — different bytes, same
    dHash)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": ids.astype(str) + ref_suffix,
                    "payload": _make_gradient_bmp_batch(ids.to_numpy(), shift),
                }
            )

    return df.select(id_col).mapInPandas(gen, schema="media_ref string, payload binary")


def _dhash_batch(bufs: list) -> "object":
    """Batch twin of dhash_bytes for a uniform batch (same header
    geometry — the common case: one builder, one image shape): headers
    are still parsed and checked per image, but the pooling and the
    bit assembly run as one numpy pipeline over the stacked pixel
    planes (guide §4.2). Returns None if the batch is not uniform —
    caller falls back to the scalar per-image decode. Same exact
    integer arithmetic as the scalar path."""
    import struct

    import numpy as np

    if not bufs:
        return np.empty(0, dtype=np.int64)
    f = bufs[0]
    if f[:2] != b"BM":
        return None
    offset = struct.unpack_from("<I", f, 10)[0]
    w, h_raw = struct.unpack_from("<ii", f, 18)
    h = abs(h_raw)
    stride = (3 * w + 3) // 4 * 4
    need = offset + stride * h
    for b in bufs:
        if (
            len(b) < need
            or b[:2] != b"BM"
            or struct.unpack_from("<I", b, 10)[0] != offset
            or struct.unpack_from("<ii", b, 18) != (w, h_raw)
        ):
            return None
    n = len(bufs)
    arr = np.stack(
        [np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset) for b in bufs]
    ).reshape(n, h, stride)
    gray = (
        arr[:, :, : 3 * w].reshape(n, h, w, 3)[:, :, :, 0].astype(np.int64)
    )  # B plane
    bh, bw = h // DHASH_BLOCK, w // DHASH_BLOCK
    pooled = gray.reshape(n, bh, DHASH_BLOCK, bw, DHASH_BLOCK).sum(
        axis=(2, 4)
    ) // (DHASH_BLOCK * DHASH_BLOCK)
    bits = pooled[:, :, 1:] > pooled[:, :, :-1]
    ks = np.arange(bh, dtype=np.int64)[:, None] * (bw - 1) + np.arange(
        bw - 1, dtype=np.int64
    )[None, :]
    return (bits * (np.int64(1) << ks)).sum(axis=(1, 2))


def decode_image_dhash(media: DataFrame) -> DataFrame:
    """Arrow-batched dHash over the binary image column — the
    perceptual-hash tier of the media pipeline (real byte decode +
    numpy pooling inside the sanctioned mapInPandas surface)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(b) for b in pdf["payload"]]
            hashes = _dhash_batch(bufs)
            if hashes is None:  # mixed geometries: exact per-image path
                hashes = [dhash_bytes(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "dhash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema="media_ref string, dhash long")


# ------------------------------------------- audio fingerprint (energy-delta)

AFP_WINDOWS = 16   # energy windows -> 15-bit fingerprint
AFP_WINDOW_LEN = 25  # samples per window (400-sample clips @8kHz)


def tone_amplitude(doc_id: int, w: int) -> int:
    """Fixture per-window amplitude ramp, bounded to 180 so a +gain
    plant never clips int16 and never reorders adjacent windows —
    shared by builder, test, and SQL oracle (the audio analog of
    gradient_brightness)."""
    return (11 * doc_id + 29 * w) % 180


def make_tone_wav(doc_id: int, gain: int = 0) -> bytes:
    """Real mono PCM16 WAV whose per-window energy follows
    tone_amplitude + gain: each AFP_WINDOW_LEN-sample window is a
    constant-amplitude block (energy = len * amplitude exactly)."""
    samples = []
    for w in range(AFP_WINDOWS):
        samples.extend([tone_amplitude(doc_id, w) + gain] * AFP_WINDOW_LEN)
    return make_wav(8000, [samples])


def audio_fingerprint_bytes(buf: bytes) -> int:
    """Energy-delta fingerprint of one PCM16 WAV from bytes alone (the
    public Shazam-family shape: band/frame energy deltas -> sign bits):
    RIFF chunk walk, de-interleave, window the first channel into
    AFP_WINDOW_LEN blocks, bit w = [energy(w+1) > energy(w)]. Gain-
    shift invariant on non-clipping audio — the near-dup property."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, nch, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, nch, _, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    frames = np.frombuffer(data, dtype="<i2").reshape(-1, nch).astype(np.int64)
    c0 = np.abs(frames[:, 0])
    n_win = len(c0) // AFP_WINDOW_LEN
    energies = c0[: n_win * AFP_WINDOW_LEN].reshape(n_win, AFP_WINDOW_LEN).sum(axis=1)
    fp = 0
    for w in range(n_win - 1):
        if energies[w + 1] > energies[w]:
            fp |= 1 << w
    return fp


def _make_tone_wav_batch(ids, gain: int = 0) -> list:
    """Batch twin of make_tone_wav: identical bytes (same PCM16 mono
    RIFF layout from make_wav), built as one numpy pipeline per Arrow
    batch instead of a 400-element Python list per clip (guide §4.2)."""
    import struct

    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    ws = np.arange(AFP_WINDOWS, dtype=np.int64)
    amp = (11 * ids[:, None] + 29 * ws[None, :]) % 180 + gain
    samples = amp.astype("<i2").repeat(AFP_WINDOW_LEN, axis=1)  # (n, 400)
    n_samp = AFP_WINDOWS * AFP_WINDOW_LEN
    sample_rate, nch = 8000, 1
    data_len = n_samp * nch * 2
    byte_rate = sample_rate * nch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, nch, sample_rate, byte_rate, nch * 2, 16
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + data_len, b"WAVE")
    prefix = hdr + fmt + struct.pack("<4sI", b"data", data_len)
    return [prefix + s.tobytes() for s in samples]


def attach_tone_wav_media(
    df: DataFrame, id_col: str = "doc_id", gain: int = 0, ref_suffix: str = ""
) -> DataFrame:
    """Deterministic tone-WAV payload per row (optionally gain-shifted +
    ref-suffixed: the audio near-dup plant — different bytes, same
    fingerprint)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_ref": ids.astype(str) + ref_suffix,
                    "payload": _make_tone_wav_batch(ids.to_numpy(), gain),
                }
            )

    return df.select(id_col).mapInPandas(gen, schema="media_ref string, payload binary")


def _audio_fp_batch(bufs: list) -> "object":
    """Batch twin of audio_fingerprint_bytes for a uniform batch (one
    builder, one clip layout): the first clip's RIFF chunk walk fixes
    the geometry, every clip's header bytes are verified against it,
    and the energy windows + delta bits run as one numpy pipeline over
    the stacked sample planes (guide §4.2). Returns None when the batch
    is not uniform — caller falls back to the scalar decode."""
    import struct

    import numpy as np

    if not bufs:
        return np.empty(0, dtype=np.int64)
    f = bufs[0]
    if f[:4] != b"RIFF" or f[8:12] != b"WAVE":
        return None
    pos, nch, data_off, data_len = 12, None, None, None
    while pos + 8 <= len(f):
        cid, size = struct.unpack_from("<4sI", f, pos)
        if cid == b"fmt ":
            tag, nch, _, _, _, bits = struct.unpack_from("<HHIIHH", f, pos + 8)
            if tag != 1 or bits != 16:
                return None
        elif cid == b"data":
            data_off, data_len = pos + 8, size
        pos += 8 + size + (size & 1)
    if nch is None or data_off is None:
        return None
    prefix = f[:data_off]
    total = data_off + data_len
    for b in bufs:
        if len(b) != len(f) or b[:data_off] != prefix or len(b) < total:
            return None
    n = len(bufs)
    frames = np.stack(
        [np.frombuffer(b, dtype="<i2", count=data_len // 2, offset=data_off) for b in bufs]
    ).reshape(n, -1, nch)
    c0 = np.abs(frames[:, :, 0].astype(np.int64))
    n_win = c0.shape[1] // AFP_WINDOW_LEN
    energies = c0[:, : n_win * AFP_WINDOW_LEN].reshape(
        n, n_win, AFP_WINDOW_LEN
    ).sum(axis=2)
    bits = energies[:, 1:] > energies[:, :-1]
    weights = np.int64(1) << np.arange(n_win - 1, dtype=np.int64)
    return (bits * weights).sum(axis=1)


def decode_audio_fingerprint(media: DataFrame) -> DataFrame:
    """Arrow-batched energy-delta fingerprint over the binary audio
    column — the audio twin of decode_image_dhash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(b) for b in pdf["payload"]]
            fps = _audio_fp_batch(bufs)
            if fps is None:  # mixed layouts: exact per-clip path
                fps = [audio_fingerprint_bytes(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "afp": pd.array(fps, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema="media_ref string, afp long")
