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


root = sys.argv[1]
meta = json.load(open(os.path.join(root, "zarr.json")))
assert meta["zarr_format"] == 3 and meta["node_type"] == "array", meta
assert meta["data_type"] == "uint16", meta
assert meta["chunk_grid"]["name"] == "regular", meta
assert meta["chunk_key_encoding"]["name"] == "default", meta
sep = meta["chunk_key_encoding"]["configuration"]["separator"]
assert sep == "/", meta
names = [c["name"] for c in meta["codecs"]]
assert names == ["bytes", "gzip", "crc32c"], names
assert meta["codecs"][0]["configuration"]["endian"] == "little", meta
assert meta["fill_value"] == 0, meta
assert "pixelResolution" in meta.get("attributes", {}), \
    "user attributes must ride inline under 'attributes'"

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
