#!/usr/bin/env python3
"""Golden WebM/Matroska fixtures for WebmIO — written INDEPENDENTLY
with a from-scratch EBML encoder (struct only; the engine's reader is
checked against bytes it did not produce — the gen_mp4_fixture
discipline).

clip.webm      — DocType webm, VP9 video track (320x180) + Opus audio
                 track (48000 Hz, 2ch), TimestampScale 1_000_000,
                 Duration 400.0 ticks. Two clusters (base 0 and 200);
                 video blocks every 40 ticks with keyframes at 0 and
                 200 (SimpleBlock flag), audio every 20 ticks all-key.
                 One video block rides in a BlockGroup WITH a
                 ReferenceBlock (non-key) and one in a BlockGroup
                 WITHOUT (key) — the two keyframe conventions. A Void
                 element and a CRC-32 child are interleaved (skipped),
                 and the Cues hold 2 CuePoints.
streaming.webm — the SAME content in a streaming mux: the Segment uses
                 the UNKNOWN-SIZE vint form (01 FF FF FF FF FF FF FF).
laced.webm     — a SimpleBlock with lacing bits set: loud reject.
badtype.webm   — DocType "quicktime": loud reject.

Block payload bytes are deterministic: video block i carries
(50 + 7*i) bytes of value i; audio block j carries (10 + 3*j) bytes of
value 0x80+j. The manifest records the expected per-track tables.
"""
import json
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "fixtures", "webm_golden")


def vint_id(vid):
    n = (vid.bit_length() + 7) // 8
    return vid.to_bytes(n, "big")


def vint_size(v, force_len=None):
    n = 1
    while n < 8 and v >= (1 << (7 * n)) - 1:
        n += 1
    if force_len is not None:
        assert force_len >= n
        n = force_len
    return (v | (1 << (7 * n))).to_bytes(n, "big")


def el(vid, payload, size_len=None):
    return vint_id(vid) + vint_size(len(payload), size_len) + payload


EBML = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TS_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUM = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIX_W = 0xB0
PIX_H = 0xBA
AUDIO = 0xE1
SAMP_FREQ = 0xB5
CHANNELS = 0x9F
CUES = 0x1C53BB6B
CUE_POINT = 0xBB
CUE_TIME = 0xB3
CUE_TRACK_POS = 0xB7
CUE_TRACK = 0xF7
CUE_CLUSTER_POS = 0xF1
CLUSTER = 0x1F43B675
CLUSTER_TS = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
REF_BLOCK = 0xFB
VOID = 0xEC
CRC32 = 0xBF


def header(doctype=b"webm"):
    return el(EBML,
              el(0x4286, b"\x01") + el(0x42F7, b"\x01") +
              el(0x42F2, b"\x04") + el(0x42F3, b"\x08") +
              el(0x4282, doctype) + el(0x4287, b"\x04") +
              el(0x4285, b"\x02"))


def uint(v):
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def simple_block(track, rel, key, data, flags_extra=0):
    flags = (0x80 if key else 0x00) | flags_extra
    return el(SIMPLE_BLOCK,
              vint_size(track) + struct.pack(">h", rel) +
              bytes([flags]) + data)


def block_group(track, rel, data, ref=None):
    body = el(BLOCK, vint_size(track) + struct.pack(">h", rel) +
              b"\x00" + data)
    if ref is not None:
        body += el(REF_BLOCK, struct.pack("b", ref))
    return el(BLOCK_GROUP, body)


def vid_payload(i):
    return bytes([i]) * (50 + 7 * i)


def aud_payload(j):
    return bytes([0x80 + j]) * (10 + 3 * j)


def build_segment_payload():
    info = el(INFO, el(TS_SCALE, uint(1000000)) +
              el(DURATION, struct.pack(">d", 400.0)))
    video = el(TRACK_ENTRY,
               el(TRACK_NUM, b"\x01") + el(TRACK_UID, b"\x01") +
               el(TRACK_TYPE, b"\x01") + el(CODEC_ID, b"V_VP9") +
               el(VIDEO, el(PIX_W, uint(320)) + el(PIX_H, uint(180))))
    audio = el(TRACK_ENTRY,
               el(TRACK_NUM, b"\x02") + el(TRACK_UID, b"\x02") +
               el(TRACK_TYPE, b"\x02") + el(CODEC_ID, b"A_OPUS") +
               el(AUDIO, el(SAMP_FREQ, struct.pack(">f", 48000.0)) +
                  el(CHANNELS, b"\x02")))
    tracks = el(TRACKS, video + audio)

    # cluster 1 at base 0: video 0(key),40,80 + one BlockGroup WITH a
    # ReferenceBlock at 120 (non-key); audio 0,20,...,100 — with a Void
    # and a CRC-32 interleaved (readers must skip both)
    c1 = el(CLUSTER_TS, uint(0))
    c1 += el(CRC32, b"\x00\x00\x00\x00")
    c1 += simple_block(1, 0, True, vid_payload(0))
    c1 += simple_block(2, 0, True, aud_payload(0))
    c1 += simple_block(2, 20, True, aud_payload(1))
    c1 += simple_block(1, 40, False, vid_payload(1))
    c1 += el(VOID, b"\x00" * 9)
    c1 += simple_block(2, 40, True, aud_payload(2))
    c1 += simple_block(2, 60, True, aud_payload(3))
    c1 += simple_block(1, 80, False, vid_payload(2))
    c1 += simple_block(2, 80, True, aud_payload(4))
    c1 += simple_block(2, 100, True, aud_payload(5))
    c1 += block_group(1, 120, vid_payload(3), ref=-3)  # non-key
    cluster1 = el(CLUSTER, c1)

    # cluster 2 at base 200: BlockGroup WITHOUT a reference (key),
    # then plain deltas
    c2 = el(CLUSTER_TS, uint(200))
    c2 += block_group(1, 0, vid_payload(4))            # key (no ref)
    c2 += simple_block(2, 0, True, aud_payload(6))
    c2 += simple_block(1, 40, False, vid_payload(5))
    c2 += simple_block(2, 20, True, aud_payload(7))
    cluster2 = el(CLUSTER, c2)

    cues = el(CUES,
              el(CUE_POINT, el(CUE_TIME, uint(0)) +
                 el(CUE_TRACK_POS, el(CUE_TRACK, b"\x01") +
                    el(CUE_CLUSTER_POS, uint(0)))) +
              el(CUE_POINT, el(CUE_TIME, uint(200)) +
                 el(CUE_TRACK_POS, el(CUE_TRACK, b"\x01") +
                    el(CUE_CLUSTER_POS, uint(1)))))
    return info, tracks, cues, cluster1, cluster2


def gen():
    os.makedirs(OUT, exist_ok=True)
    info, tracks, cues, cluster1, cluster2 = build_segment_payload()
    seg_payload = info + tracks + cues + cluster1 + cluster2

    with open(os.path.join(OUT, "clip.webm"), "wb") as f:
        f.write(header() + el(SEGMENT, seg_payload))

    # streaming mux: unknown-size Segment (all-ones 8-byte vint)
    with open(os.path.join(OUT, "streaming.webm"), "wb") as f:
        f.write(header() + vint_id(SEGMENT) +
                b"\x01\xff\xff\xff\xff\xff\xff\xff" + seg_payload)

    # laced SimpleBlock (EBML lacing bits 0x06) -> loud reject
    laced = el(CLUSTER, el(CLUSTER_TS, uint(0)) +
               simple_block(1, 0, True, b"\x05" * 8, flags_extra=0x06))
    with open(os.path.join(OUT, "laced.webm"), "wb") as f:
        f.write(header() + el(SEGMENT, info + tracks + laced))

    with open(os.path.join(OUT, "badtype.webm"), "wb") as f:
        f.write(header(b"quicktime") + el(SEGMENT, seg_payload))

    vt = [(0, True), (40, False), (80, False), (120, False),
          (200, True), (240, False)]
    at = [(t, True) for t in (0, 20, 40, 60, 80, 100, 200, 220)]
    manifest = {
        "clip.webm": {
            "doctype": "webm", "timestamp_scale": 1000000,
            "duration": 400.0, "n_cues": 2,
            "tracks": [
                {"number": 1, "type": 1, "codec": "V_VP9",
                 "width": 320, "height": 180,
                 "times": [t for t, _ in vt],
                 "keys": [k for _, k in vt],
                 "sizes": [50 + 7 * i for i in range(6)]},
                {"number": 2, "type": 2, "codec": "A_OPUS",
                 "rate": 48000.0, "channels": 2,
                 "times": [t for t, _ in at],
                 "keys": [k for _, k in at],
                 "sizes": [10 + 3 * j for j in range(8)]},
            ]}}
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {OUT}: clip.webm ({os.path.getsize(os.path.join(OUT, 'clip.webm'))} B) "
          f"+ streaming/laced/badtype")


if __name__ == "__main__":
    gen()
