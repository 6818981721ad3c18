#!/usr/bin/env python3
"""Independent check of the engine's zarr v3 WRITE path (r18).

Decodes a non-sharded v3 store the engine wrote (Zarr3Spec passes its
temp path) with numpy + stdlib gzip + a table-driven CRC32C ONLY — no
engine code, no zarr import — and verifies:
  - zarr.json declares the v3 array profile the engine claims to emit
    (regular grid, default chunk-key encoding, [bytes LE, gzip, crc32c])
  - every chunk file's trailing CRC32C matches its gzip payload
  - every non-fill voxel equals the sharded-source generator formula
    v(z,y,x) = (100z + 17y + 3x + 7) mod 65536, with the fixture's
    index-missing inner chunk (engine grid gx<2,gy<2,gz=1) all-zero and
    the missing shard's chunks (gx in 2..3, gy=2, gz=4) ABSENT
— the mirror of what tools/gen_zarr3_fixture.py does for the READ path.

Usage: python3 tools/check_zarr3_write.py <store-dir>   (run by Zarr3Spec)
"""
import gzip
import json
import math
import os
import struct
import sys

import numpy as np

_TBL = []
for n in range(256):
    c = n
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _TBL.append(c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TBL[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def check_sharded(root, meta):
    """r19: the engine's SHARDED write profile. Decodes every shard file
    independently — end-located u64-pair index with its own crc32c,
    [bytes LE, gzip, crc32c] inner chunks, all-ones entries for
    never-written slots — and verifies voxel identity with the source
    formula: the source's index-missing inner chunk (zarr z=1, y<2, x<2)
    arrives as a WRITTEN zeros chunk (the read materialized fill), and
    the source's missing shard (z=4, y in 4..5, x in 4..7) maps onto
    output shard c/2/1/1, which must be wholly ABSENT.
    """
    cfg = meta["codecs"][0]["configuration"]
    inner = cfg["chunk_shape"]
    names = [c["name"] for c in cfg["codecs"]]
    assert names == ["bytes", "gzip", "crc32c"], names
    assert cfg["codecs"][0]["configuration"]["endian"] == "little", cfg
    inames = [c["name"] for c in cfg["index_codecs"]]
    assert inames == ["bytes", "crc32c"], inames
    assert cfg["index_codecs"][0]["configuration"]["endian"] == "little", cfg
    assert cfg["index_location"] == "end", cfg

    shape = meta["shape"]                   # z, y, x (C order)
    outer = meta["chunk_grid"]["configuration"]["chunk_shape"]
    cps = [o // i for o, i in zip(outer, inner)]
    assert [i * c for i, c in zip(inner, cps)] == outer, (inner, outer)
    sgrid = [math.ceil(s / o) for s, o in zip(shape, outer)]
    igrid = [math.ceil(s / i) for s, i in zip(shape, inner)]
    n_inner = cps[0] * cps[1] * cps[2]
    ONES = (1 << 64) - 1

    got = np.full(shape, -1, dtype=np.int64)
    absent_shards = []
    n_chunks = 0
    for sz in range(sgrid[0]):
        for sy in range(sgrid[1]):
            for sx in range(sgrid[2]):
                p = os.path.join(root, "c", str(sz), str(sy), str(sx))
                if not os.path.exists(p):
                    absent_shards.append((sz, sy, sx))
                    continue
                raw = open(p, "rb").read()
                idx_size = 16 * n_inner + 4
                assert len(raw) >= idx_size, f"shard {p} shorter than its index"
                idx_raw = raw[-idx_size:]
                idx, icrc = idx_raw[:-4], struct.unpack("<I", idx_raw[-4:])[0]
                assert crc32c(idx) == icrc, f"index crc mismatch at {p}"
                pairs = struct.unpack("<%dQ" % (2 * n_inner), idx)
                for flat in range(n_inner):
                    lz = flat // (cps[1] * cps[2])
                    ly = (flat // cps[2]) % cps[1]
                    lx = flat % cps[2]
                    gz, gy, gx = sz * cps[0] + lz, sy * cps[1] + ly, \
                        sx * cps[2] + lx
                    off, nb = pairs[2 * flat], pairs[2 * flat + 1]
                    in_bounds = gz < igrid[0] and gy < igrid[1] and gx < igrid[2]
                    if not in_bounds:
                        assert off == ONES and nb == ONES, \
                            f"out-of-bounds slot {flat} of {p} not all-ones"
                        continue
                    assert off != ONES and nb != ONES, \
                        f"in-bounds inner chunk ({gz},{gy},{gx}) missing in {p}"
                    chunk = raw[off:off + nb]
                    body, ccrc = chunk[:-4], struct.unpack("<I", chunk[-4:])[0]
                    assert crc32c(body) == ccrc, \
                        f"inner chunk crc mismatch at {p}:{flat}"
                    full = np.frombuffer(gzip.decompress(body),
                                         dtype="<u2").reshape(inner)
                    z0, y0, x0 = gz * inner[0], gy * inner[1], gx * inner[2]
                    ze, ye, xe = (min(z0 + inner[0], shape[0]),
                                  min(y0 + inner[1], shape[1]),
                                  min(x0 + inner[2], shape[2]))
                    got[z0:ze, y0:ye, x0:xe] = \
                        full[: ze - z0, : ye - y0, : xe - x0]
                    pad = full.copy()
                    pad[: ze - z0, : ye - y0, : xe - x0] = 0
                    assert (pad == 0).all(), f"edge padding not fill at {p}:{flat}"
                    n_chunks += 1

    zz, yy, xx = np.indices(shape)
    expect = ((100 * zz + 17 * yy + 3 * xx + 7) % 65536).astype(np.int64)
    expect[1:2, 0:2, 0:2] = 0         # source fill chunk, written as zeros
    expect[4:5, 4:6, 4:8] = -1        # source missing shard: stays absent
    assert absent_shards == [(2, 1, 1)], absent_shards
    assert (got == expect).all(), "sharded voxels diverged from the source"
    print(f"INDEPENDENT V3 SHARDED WRITE CHECK PASSED: {n_chunks} inner "
          f"chunks crc-verified across {sgrid[0]*sgrid[1]*sgrid[2]-1} shards; "
          f"indexes crc-verified; out-of-bounds slots all-ones; "
          f"missing shard absent")


root = sys.argv[1]
meta = json.load(open(os.path.join(root, "zarr.json")))
assert meta["zarr_format"] == 3 and meta["node_type"] == "array", meta
assert meta["data_type"] == "uint16", meta
assert meta["chunk_grid"]["name"] == "regular", meta
assert meta["chunk_key_encoding"]["name"] == "default", meta
sep = meta["chunk_key_encoding"]["configuration"]["separator"]
assert sep == "/", meta
assert meta["fill_value"] == 0, meta
assert "pixelResolution" in meta.get("attributes", {}), \
    "user attributes must ride inline under 'attributes'"
if (len(meta["codecs"]) == 1
        and meta["codecs"][0]["name"] == "sharding_indexed"):
    check_sharded(root, meta)
    sys.exit(0)
names = [c["name"] for c in meta["codecs"]]
assert names == ["bytes", "gzip", "crc32c"], names
assert meta["codecs"][0]["configuration"]["endian"] == "little", meta

shape = meta["shape"]                       # z, y, x (C order)
chunks = meta["chunk_grid"]["configuration"]["chunk_shape"]
grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
zz, yy, xx = np.indices(shape)
expect = ((100 * zz + 17 * yy + 3 * xx + 7) % 65536).astype("<u2")

# fixture geometry (engine axes reversed): fill chunk at engine
# (gx<2? no: gx 0, gy 0, gz 1) = zarr chunk (z=1, y=0, x=0); missing
# shard = zarr chunks z=4, y=2, x in {2,3}
FILL = {(1, 0, 0)}
ABSENT = {(4, 2, 2), (4, 2, 3)}

n_ok = 0
for cz in range(grid[0]):
    for cy in range(grid[1]):
        for cx in range(grid[2]):
            p = os.path.join(root, "c", str(cz), str(cy), str(cx))
            if (cz, cy, cx) in ABSENT:
                assert not os.path.exists(p), f"chunk {p} should be absent"
                continue
            raw = open(p, "rb").read()
            body, crc = raw[:-4], struct.unpack("<I", raw[-4:])[0]
            assert crc32c(body) == crc, f"crc mismatch at {p}"
            full = np.frombuffer(gzip.decompress(body),
                                 dtype="<u2").reshape(chunks)
            z0, y0, x0 = cz * chunks[0], cy * chunks[1], cx * chunks[2]
            ze, ye, xe = (min(z0 + chunks[0], shape[0]),
                          min(y0 + chunks[1], shape[1]),
                          min(x0 + chunks[2], shape[2]))
            got = full[: ze - z0, : ye - y0, : xe - x0]
            want = (np.zeros_like(got) if (cz, cy, cx) in FILL
                    else expect[z0:ze, y0:ye, x0:xe])
            assert (got == want).all(), f"voxels diverged in chunk {p}"
            # edge padding must be fill, not garbage
            pad = full.copy()
            pad[: ze - z0, : ye - y0, : xe - x0] = 0
            assert (pad == 0).all(), f"edge padding not fill at {p}"
            n_ok += 1

print(f"INDEPENDENT V3 WRITE CHECK PASSED: {n_ok} chunks crc-verified, "
      f"all voxels match; fill chunk zero; missing-shard chunks absent")
