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
