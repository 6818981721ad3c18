#!/usr/bin/env python3
"""Independent check of the engine's zarr v2 WRITE path (r14).

Decodes the container ZarrSpec writes to target/zarr_write_check/vol with
numpy + stdlib zlib ONLY (no engine code, no zarr/numcodecs import) and
verifies every voxel against the fixture generator formula
v(z,y,x) = (1000z + 57y + 13x) mod 65536 — so the written chunks and
.zarray are validated by a second implementation of the public spec, the
mirror of what tools/gen_zarr_fixture.py does for the READ path.

Usage: sbt "testOnly graft.sources.n5.ZarrSpec"   (writes the container)
       python3 tools/check_zarr_write.py
"""
import json
import math
import os
import sys
import zlib

import numpy as np

root = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "target",
                 "zarr_write_check", "vol")
za = json.load(open(os.path.join(root, ".zarray")))
assert za["zarr_format"] == 2 and za["order"] == "C", za
assert za["dtype"] == "<u2" and za["compressor"]["id"] == "zlib", za
shape, chunks = za["shape"], za["chunks"]
arr = np.zeros(shape, dtype="<u2")
grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
n = 0
for cz in range(grid[0]):
    for cy in range(grid[1]):
        for cx in range(grid[2]):
            raw = zlib.decompress(
                open(os.path.join(root, f"{cz}.{cy}.{cx}"), "rb").read())
            ch = np.frombuffer(raw, dtype="<u2").reshape(chunks)
            z0, y0, x0 = cz * chunks[0], cy * chunks[1], cx * chunks[2]
            ze = min(z0 + chunks[0], shape[0])
            ye = min(y0 + chunks[1], shape[1])
            xe = min(x0 + chunks[2], shape[2])
            arr[z0:ze, y0:ye, x0:xe] = ch[: ze - z0, : ye - y0, : xe - x0]
            n += 1
zz, yy, xx = np.indices(shape)
expect = (1000 * zz + 57 * yy + 13 * xx) % 65536
assert (arr == expect).all(), "voxel mismatch"
print(f"INDEPENDENT WRITE CHECK PASSED: {n} chunks, "
      f"all {arr.size} voxels match the formula")


def read_array(adir):
    za = json.load(open(os.path.join(adir, ".zarray")))
    assert za["zarr_format"] == 2 and za["order"] == "C", za
    shape, chunks = za["shape"], za["chunks"]
    arr = np.zeros(shape, dtype=za["dtype"])
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    for cz in range(grid[0]):
        for cy in range(grid[1]):
            for cx in range(grid[2]):
                raw = zlib.decompress(
                    open(os.path.join(adir, f"{cz}.{cy}.{cx}"), "rb").read())
                ch = np.frombuffer(raw, dtype=za["dtype"]).reshape(chunks)
                z0, y0, x0 = cz * chunks[0], cy * chunks[1], cx * chunks[2]
                ze, ye, xe = (min(z0 + chunks[0], shape[0]),
                              min(y0 + chunks[1], shape[1]),
                              min(x0 + chunks[2], shape[2]))
                arr[z0:ze, y0:ye, x0:xe] = \
                    ch[: ze - z0, : ye - y0, : xe - x0]
    return arr


# ---- r15: OME-NGFF multiscale pyramid over a zarr store ---------------
# Validates the container ZarrSpec's pyramid test writes: .zgroup markers,
# .zattrs multiscales (v0.4 axes/datasets/scale transforms), and the s1
# voxels against an independently computed trimmed windowed mean of s0.
pyr_root = os.path.join(os.path.dirname(root), "..", "zarr_pyramid_check") \
    if root.endswith("vol") else None
if pyr_root and os.path.isdir(pyr_root):
    assert json.load(open(os.path.join(pyr_root, ".zgroup")))[
        "zarr_format"] == 2
    assert json.load(open(os.path.join(pyr_root, "pyr", ".zgroup")))[
        "zarr_format"] == 2
    zattrs = json.load(open(os.path.join(pyr_root, "pyr", ".zattrs")))
    ms = zattrs["multiscales"]
    assert len(ms) == 1 and ms[0]["version"] == "0.4", ms
    assert [a["name"] for a in ms[0]["axes"]] == ["z", "y", "x"], ms
    assert [a["type"] for a in ms[0]["axes"]] == ["space"] * 3, ms
    dsets = ms[0]["datasets"]
    assert [d["path"] for d in dsets] == ["s0", "s1"], dsets
    for i, d in enumerate(dsets):
        ct = d["coordinateTransformations"]
        assert len(ct) == 1 and ct[0]["type"] == "scale", ct
        assert ct[0]["scale"] == [float(2 ** i)] * 3, ct
    s0 = read_array(os.path.join(pyr_root, "pyr", "s0")).astype(np.int64)
    s1 = read_array(os.path.join(pyr_root, "pyr", "s1"))
    tz, ty, tx = (d // 2 * 2 for d in s0.shape)
    t = s0[:tz, :ty, :tx]
    mean = (t.reshape(tz // 2, 2, ty // 2, 2, tx // 2, 2)
            .sum(axis=(1, 3, 5)) // 8)  # integer truncation
    assert s1.shape == mean.shape, (s1.shape, mean.shape)
    assert (s1 == mean).all(), "pyramid s1 voxels diverge from the mean"
    # the per-level user attrs must be in .zattrs, NOT .zarray
    s1_zarray = json.load(open(os.path.join(pyr_root, "pyr", "s1", ".zarray")))
    assert "downsamplingFactors" not in s1_zarray, s1_zarray
    s1_zattrs = json.load(open(os.path.join(pyr_root, "pyr", "s1", ".zattrs")))
    assert s1_zattrs["downsamplingFactors"] == [2, 2, 2], s1_zattrs
    print("INDEPENDENT PYRAMID CHECK PASSED: .zgroup + NGFF multiscales "
          f"valid, {s1.size} s1 voxels match the independent mean")
