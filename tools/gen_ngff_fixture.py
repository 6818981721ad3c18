#!/usr/bin/env python3
"""Generate the checked-in FOREIGN OME-NGFF golden fixture at
fixtures/zarr_golden/ngff (r16, VERDICT r15 #7).

INDEPENDENT writer, like gen_zarr_fixture.py: implements the zarr v2
storage spec and the OME-NGFF 0.4 multiscales metadata directly with
numpy + json + zlib from the Python stdlib — no zarr/ome-zarr import —
so N5.readGroup's NGFF-driven level discovery is validated against a
second implementation of the metadata convention, not against the
engine's own writer.

Layout (the point: level datasets are NOT named s0/s1 — they use the
bare "0"/"1" names the ome-zarr ecosystem actually writes, so the
engine's c*/s* directory convention finds nothing and MUST resolve the
pyramid through .zattrs multiscales):

  ngff/.zgroup
  ngff/pyr/.zgroup
  ngff/pyr/.zattrs      multiscales v0.4, datasets [{path:"0"},{path:"1"}]
  ngff/pyr/0/           3-D uint16 [4,6,8] (z,y,x C-order), chunks [2,3,4],
                        "<u2", zlib 6; v = (500*z + 31*y + 7*x) % 65536
  ngff/pyr/1/           the 2x2x2 windowed MEAN of level 0 (floor), same
                        dtype/codec, chunks [1,2,2]

Prints per-level (n, checksum) for the ZarrSpec golden pins.
"""
import json, os, sys, zlib
import itertools
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/zarr_golden/ngff"


def write_array(path, arr, chunks, dtype):
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "compressor": {"id": "zlib", "level": 6},
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, indent=1)
    grids = [range((s + c - 1) // c) for s, c in zip(arr.shape, chunks)]
    for idx in itertools.product(*grids):
        full = np.zeros(chunks, dtype=arr.dtype)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, arr.shape))
        sub = arr[sl]
        full[tuple(slice(0, d) for d in sub.shape)] = sub
        with open(os.path.join(path, ".".join(str(i) for i in idx)), "wb") as f:
            f.write(zlib.compress(full.astype(dtype).tobytes(order="C"), 6))


z, y, x = np.meshgrid(np.arange(4), np.arange(6), np.arange(8),
                      indexing="ij")
l0 = ((500 * z + 31 * y + 7 * x) % 65536).astype(np.uint16)
# 2x2x2 windowed mean, floor — deterministic integer golden
l1 = (l0.reshape(2, 2, 3, 2, 4, 2).astype(np.int64)
      .sum(axis=(1, 3, 5)) // 8).astype(np.uint16)

grp = os.path.join(out, "pyr")
write_array(os.path.join(grp, "0"), l0, (2, 3, 4), "<u2")
write_array(os.path.join(grp, "1"), l1, (1, 2, 2), "<u2")

for p in (out, grp):
    with open(os.path.join(p, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)

multiscales = [{
    "version": "0.4",
    "name": "pyr",
    "axes": [{"name": a, "type": "space"} for a in ("z", "y", "x")],
    "datasets": [
        {"path": "0",
         "coordinateTransformations": [{"type": "scale",
                                        "scale": [1.0, 1.0, 1.0]}]},
        {"path": "1",
         "coordinateTransformations": [{"type": "scale",
                                        "scale": [2.0, 2.0, 2.0]}]},
    ],
}]
with open(os.path.join(grp, ".zattrs"), "w") as f:
    json.dump({"multiscales": multiscales}, f, indent=1)

for name, a in (("0", l0), ("1", l1)):
    print("level %s: shape(zyx)=%s n=%d checksum=%d"
          % (name, list(a.shape), a.size, int(a.astype(np.int64).sum())))
