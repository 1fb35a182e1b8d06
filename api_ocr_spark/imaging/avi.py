"""RIFF/AVI MJPEG container (stdlib struct — no video libraries).

Real video frame extraction for the multimodal operators: Motion-JPEG is
just JPEG frames in RIFF chunks, and the engine ships its own baseline-JPEG
codec (imaging/jpeg.py) — so MJPEG-AVI decode is honestly implementable
here from scratch. Inter-frame codecs (H.264/VP9/…) remain behind the
documented stub in operators/multimodal.py.

Writer builds a minimal standard AVI (hdrl: avih + one vids/MJPG strl;
movi: '00dc' chunks; idx1 index) that the parser — and any mainstream
player — can read. Parser walks the chunk tree, collects '..dc'/'..db'
payloads that start with the JPEG SOI marker, and derives fps from the
stream header's rate/scale (falling back to avih microseconds-per-frame).
"""

from __future__ import annotations

import struct


def encode_mjpeg_avi(frames: list[bytes], fps: int = 10,
                     width: int = 0, height: int = 0) -> bytes:
    """JPEG frame byte strings → minimal MJPEG AVI."""
    if not frames:
        raise ValueError("no frames")
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_len * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_len, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max_len, 0xFFFFFFFF & -1, 0, 0, 0, int(width), int(height))
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame; offsets are relative to the 'movi' fourcc
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(data: bytes) -> tuple[list[bytes], float]:
    """AVI bytes → (list of JPEG frame byte strings, fps).

    Raises ValueError on non-AVI input or when no MJPEG frames are found
    (e.g. a compressed-codec AVI — that is the stub's territory)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    frames: list[bytes] = []
    fps = 0.0
    micro_per_frame = 0

    def walk(pos: int, end: int) -> None:
        nonlocal fps, micro_per_frame
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if body_start + size > len(data):
                raise ValueError("truncated chunk")
            if cid in (b"RIFF", b"LIST"):
                walk(body_start + 4, body_start + size)  # skip form type
            elif cid == b"avih" and size >= 4:
                (micro_per_frame,) = struct.unpack_from("<I", data, body_start)
            elif cid == b"strh" and size >= 32:
                fcc_type = data[body_start:body_start + 4]
                scale, rate = struct.unpack_from("<II", data, body_start + 20)
                if fcc_type == b"vids" and scale:
                    fps = rate / scale
            elif cid[2:4] in (b"dc", b"db"):
                payload = data[body_start:body_start + size]
                if payload[:2] == b"\xff\xd8":
                    frames.append(payload)
            pos = body_start + size + (size & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("no MJPEG frames found")
    if not fps and micro_per_frame:
        fps = 1_000_000 / micro_per_frame
    return frames, float(fps or 0.0)
