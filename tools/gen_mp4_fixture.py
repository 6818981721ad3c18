#!/usr/bin/env python3
"""Golden MP4 (ISO-BMFF) fixtures for Mp4IO — written INDEPENDENTLY with
struct.pack (the gen_tar_fixture discipline: the engine's reader is
checked against bytes it did not produce). Samples are deterministic
opaque payloads (the CONTAINER walk is what's pinned — sample-table
resolution through stsd/stts/stsc/stsz/stco|co64 — not any codec), plus
a manifest of per-sample (offset, size, sha256, decode time) and track
metadata for the spec to pin.

Fixtures:
  clip.mp4      — video 'jpeg' track with TWO stsc runs (chunks of 3+2
                  then 2 samples), explicit stsz, stco, an stss sync
                  table (samples 1 and 4); and a second 'soun' track
                  the reader must surface-but-not-decode.
  clip_co64.mp4 — uniform stsz, 64-bit co64 chunk offsets, one
                  sample-per-chunk (no stss: all samples sync).
  clip_frag.mp4 — FRAGMENTED (r18): empty-table moov + mvex/trex, two
                  moof/mdat pairs; fragment 1 uses an explicit
                  base_data_offset + per-sample durations+sizes+flags
                  in the trun; fragment 2 uses default-base-is-moof,
                  tfhd default duration, trex default flags with a
                  first-sample-flags override, and a version-1 tfdt
                  that JUMPS the decode time (readers must honor tfdt
                  over accumulation).
"""
import hashlib
import json
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "fixtures", "mp4_golden")


def det_bytes(seed: int, n: int) -> bytes:
    return bytes(((i * 2654435761 + seed * 40503) >> 16) & 0xFF
                 for i in range(n))


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(typ, struct.pack(">B3s", version,
                                flags.to_bytes(3, "big")) + payload)


def matrix() -> bytes:
    return struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def visual_entry(fourcc: bytes, w: int, h: int) -> bytes:
    e = struct.pack(">6xH", 1)                    # reserved, data_ref_index
    e += struct.pack(">HH3I", 0, 0, 0, 0, 0)       # pre_defined/reserved
    e += struct.pack(">HH", w, h)
    e += struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
    e += b"\x00" * 32                              # compressorname
    e += struct.pack(">Hh", 24, -1)
    return struct.pack(">I", len(e) + 8) + fourcc + e


def sound_entry() -> bytes:
    e = struct.pack(">6xH", 1)
    e += struct.pack(">HHI", 0, 0, 0)              # version, revision, vendor
    e += struct.pack(">HHHHI", 2, 16, 0, 0, 8000 << 16)
    return struct.pack(">I", len(e) + 8) + b"twos" + e


def track(track_id, handler, timescale, duration, stsd_entry, stts_runs,
          stsc_runs, sizes, uniform_size, chunk_offsets, co64, w=0, h=0,
          stss=None):
    tkhd = full(b"tkhd", 0, 7,
                struct.pack(">IIII4xI8x4H", 0, 0, track_id, 0, duration,
                            0, 0, 0, 0) + matrix() +
                struct.pack(">II", w << 16, h << 16))
    mdhd = full(b"mdhd", 0, 0,
                struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0,
                struct.pack(">I4s12x", 0, handler) + b"pygen\x00")
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = full(b"stts", 0, 0, struct.pack(">I", len(stts_runs)) +
                b"".join(struct.pack(">II", c, d) for c, d in stts_runs))
    stsc = full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs)) +
                b"".join(struct.pack(">III", f, n, 1) for f, n in stsc_runs))
    if uniform_size:
        stsz = full(b"stsz", 0, 0, struct.pack(">II", uniform_size, len(sizes)))
    else:
        stsz = full(b"stsz", 0, 0, struct.pack(">II", 0, len(sizes)) +
                    b"".join(struct.pack(">I", s) for s in sizes))
    if co64:
        stco = full(b"co64", 0, 0, struct.pack(">I", len(chunk_offsets)) +
                    b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    else:
        stco = full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets)) +
                    b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl_kids = stsd + stts + stsc + stsz + stco
    if stss:
        stbl_kids += full(b"stss", 0, 0, struct.pack(">I", len(stss)) +
                          b"".join(struct.pack(">I", s) for s in stss))
    stbl = box(b"stbl", stbl_kids)
    if handler == b"vide":
        mhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    else:
        mhd = full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = full(b"dref", 0, 0, struct.pack(">I", 1) +
                full(b"url ", 0, 1, b""))
    minf = box(b"minf", mhd + box(b"dinf", dref) + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", tkhd + mdia)


def gen():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}

    # ---- clip.mp4: video 'jpeg' 5 samples in chunks of [3, 2] (two
    # stsc runs), plus a 'soun' track with 2 samples in one chunk
    vsizes = [301, 257, 410, 333, 289]
    vsamples = [det_bytes(10 + i, s) for i, s in enumerate(vsizes)]
    asizes = [120, 140]
    asamples = [det_bytes(50 + i, s) for i, s in enumerate(asizes)]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(vsamples) + b"".join(asamples)
    mdat_off = len(ftyp) + 8
    voffsets = []
    off = mdat_off
    for s in vsizes:
        voffsets.append(off)
        off += s
    aoff = off
    vchunks = [voffsets[0], voffsets[3]]   # chunk1: samples 0-2, chunk2: 3-4
    timescale, delta = 30000, 1001
    vtrak = track(1, b"vide", timescale, delta * 5,
                  visual_entry(b"jpeg", 64, 48),
                  [(5, delta)], [(1, 3), (2, 2)], vsizes, 0, vchunks,
                  co64=False, w=64, h=48, stss=[1, 4])
    atrak = track(2, b"soun", 8000, 2048,
                  sound_entry(), [(2, 1024)], [(1, 2)], asizes, 0, [aoff],
                  co64=False)
    mvhd = full(b"mvhd", 0, 0,
                struct.pack(">IIII", 0, 0, 1000, 0) +
                struct.pack(">IH2xII", 0x10000, 0x100, 0, 0) + matrix() +
                struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 3))
    moov = box(b"moov", mvhd + vtrak + atrak)
    data = ftyp + box(b"mdat", mdat_payload) + moov
    with open(os.path.join(OUT, "clip.mp4"), "wb") as f:
        f.write(data)
    manifest["clip.mp4"] = {
        "tracks": [
            {"trackId": 1, "handler": "vide", "codec": "jpeg",
             "width": 64, "height": 48, "timescale": timescale,
             "sync": [True, False, False, True, False],
             "samples": [
                 {"offset": o, "size": s, "time": i * delta,
                  "sha256": hashlib.sha256(p).hexdigest()}
                 for i, (o, s, p) in enumerate(zip(voffsets, vsizes, vsamples))]},
            {"trackId": 2, "handler": "soun", "codec": "twos",
             "timescale": 8000,
             "samples": [
                 {"offset": aoff + (0 if i == 0 else asizes[0]),
                  "size": s, "time": i * 1024,
                  "sha256": hashlib.sha256(p).hexdigest()}
                 for i, (s, p) in enumerate(zip(asizes, asamples))]},
        ]}

    # ---- clip_co64.mp4: uniform stsz, co64, one sample per chunk
    n = 4
    usize = 256
    usamples = [det_bytes(90 + i, usize) for i in range(n)]
    ftyp2 = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    base2 = len(ftyp2) + 8
    uoffsets = [base2 + i * usize for i in range(n)]
    utrak = track(1, b"vide", 12800, 512 * n,
                  visual_entry(b"jpeg", 32, 32),
                  [(n, 512)], [(1, 1)], [usize] * n, usize, uoffsets,
                  co64=True, w=32, h=32)
    mvhd2 = full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 1000, 0) +
                 struct.pack(">IH2xII", 0x10000, 0x100, 0, 0) + matrix() +
                 struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
    data2 = ftyp2 + box(b"mdat", b"".join(usamples)) + box(b"moov", mvhd2 + utrak)
    with open(os.path.join(OUT, "clip_co64.mp4"), "wb") as f:
        f.write(data2)
    manifest["clip_co64.mp4"] = {
        "tracks": [
            {"trackId": 1, "handler": "vide", "codec": "jpeg",
             "width": 32, "height": 32, "timescale": 12800,
             "samples": [
                 {"offset": o, "size": usize, "time": i * 512,
                  "sha256": hashlib.sha256(p).hexdigest()}
                 for i, (o, p) in enumerate(zip(uoffsets, usamples))]},
        ]}

    # ---- clip_frag.mp4 (r18): fragmented layout — empty-table moov +
    # mvex/trex, then two moof/mdat pairs with deliberately DIFFERENT
    # parameter sourcing so the default-inheritance chain is pinned:
    #   frag 1: explicit base_data_offset; trun carries per-sample
    #           durations + sizes + flags (sample 1 sync, 2-3 not)
    #   frag 2: default-base-is-moof; durations from tfhd default;
    #           flags from TREX default (non-sync) with a
    #           first-sample-flags override (sync); v1 tfdt JUMPS time
    fsizes = [211, 187, 243, 199, 225]
    fsamples = [det_bytes(70 + i, s) for i, s in enumerate(fsizes)]
    fts = 12800
    ftyp3 = box(b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5isom")
    # moov shell: same track() helper with empty tables
    shell = track(1, b"vide", fts, 0, visual_entry(b"jpeg", 32, 32),
                  [], [], [], 0, [], co64=False, w=32, h=32)
    trex = full(b"trex", 0, 0,
                struct.pack(">IIIII", 1, 1, 999, 0, 0x01010000))
    mvex = box(b"mvex", trex)
    mvhd3 = full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, fts, 0) +
                 struct.pack(">IH2xII", 0x10000, 0x100, 0, 0) + matrix() +
                 struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
    moov3 = box(b"moov", mvhd3 + shell + mvex)
    head = ftyp3 + moov3

    # fragment 1: 3 samples, explicit per-sample everything
    g1 = fsamples[:3]
    NONSYNC, SYNC = 0x01010000, 0x02000000
    f1_durs = [512, 480, 544]
    f1_flags = [SYNC, NONSYNC, NONSYNC]

    def build_frag1(data_off):
        mfhd = full(b"mfhd", 0, 0, struct.pack(">I", 1))
        tfhd = full(b"tfhd", 0, 0x000001,
                    struct.pack(">IQ", 1, data_off))
        tfdt = full(b"tfdt", 0, 0, struct.pack(">I", 0))
        trun_pay = struct.pack(">I", 3)
        for dur, sz, fl in zip(f1_durs, [len(s) for s in g1], f1_flags):
            trun_pay += struct.pack(">III", dur, sz, fl)
        trun = full(b"trun", 0, 0x000700, trun_pay)
        return box(b"moof", mfhd + box(b"traf", tfhd + tfdt + trun))

    # base_data_offset = absolute offset of frag1's mdat payload
    f1_size = len(build_frag1(0))
    f1_data_at = len(head) + f1_size + 8
    moof1 = build_frag1(f1_data_at)
    mdat1 = box(b"mdat", b"".join(g1))

    # fragment 2: 2 samples, defaults + tfdt jump to 4096
    g2 = fsamples[3:]

    def build_frag2(data_off):
        mfhd = full(b"mfhd", 0, 0, struct.pack(">I", 2))
        # flags: default-base-is-moof | default-sample-duration-present
        tfhd = full(b"tfhd", 0, 0x020008, struct.pack(">II", 1, 600))
        tfdt = full(b"tfdt", 1, 0, struct.pack(">Q", 4096))
        # trun flags: data-offset + first-sample-flags + sizes only
        trun_pay = struct.pack(">IiI", 2, data_off, SYNC)
        for s in g2:
            trun_pay += struct.pack(">I", len(s))
        trun = full(b"trun", 0, 0x000205, trun_pay)
        return box(b"moof", mfhd + box(b"traf", tfhd + tfdt + trun))

    f2_size = len(build_frag2(0))
    moof2 = build_frag2(f2_size + 8)  # relative to moof start
    mdat2 = box(b"mdat", b"".join(g2))
    data3 = head + moof1 + mdat1 + moof2 + mdat2
    with open(os.path.join(OUT, "clip_frag.mp4"), "wb") as f:
        f.write(data3)

    f1_times = [0, 512, 992]          # cumsum of f1_durs from tfdt 0
    f2_times = [4096, 4696]           # tfdt jump, then tfhd default 600
    foffsets = []
    off = f1_data_at
    for s in fsizes[:3]:
        foffsets.append(off)
        off += s
    f2_data_at = len(head) + f1_size + 8 + len(b"".join(g1)) + f2_size + 8
    off = f2_data_at
    for s in fsizes[3:]:
        foffsets.append(off)
        off += s
    manifest["clip_frag.mp4"] = {
        "tracks": [
            {"trackId": 1, "handler": "vide", "codec": "jpeg",
             "width": 32, "height": 32, "timescale": fts,
             "sync": [True, False, False, True, False],
             "samples": [
                 {"offset": o, "size": s, "time": t,
                  "sha256": hashlib.sha256(p).hexdigest()}
                 for o, s, t, p in zip(foffsets, fsizes,
                                       f1_times + f2_times, fsamples)]},
        ]}

    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {OUT}: clip.mp4 ({len(data)} B), clip_co64.mp4 "
          f"({len(data2)} B), clip_frag.mp4 ({len(data3)} B)")


if __name__ == "__main__":
    gen()
