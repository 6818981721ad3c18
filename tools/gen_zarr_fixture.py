#!/usr/bin/env python3
"""Generate the checked-in zarr v2 golden fixture at fixtures/zarr_golden/.

INDEPENDENT writer: implements the public zarr v2 storage spec
(https://zarr.readthedocs.io/en/stable/spec/v2.html) directly with
numpy + json + zlib/gzip from the Python stdlib — no zarr/numcodecs
import — so the engine's reader is validated against a second
implementation of the spec, not against itself (the ADVICE r13 blosc
lesson).

Arrays:
  vol    — 3-D uint16, shape [5,7,11] (z,y,x C-order), chunks [2,3,4],
           "<u2", zlib level 6, default "." separator (key omitted),
           v(z,y,x) = (1000*z + 57*y + 13*x) % 65536. Edge chunks on all
           three axes; all 27 chunks present.
  sparse — 2-D float32, shape [4,4], chunks [2,2], "<f4", gzip level 5,
           "/" separator, chunk 1/1 DELIBERATELY missing (zarr: reads as
           fill_value; the engine's sparse block scan skips it, matching
           its N5 missing-block semantics).

Prints the per-chunk golden (gx,gy,gz,sx,sy,sz,n,checksum) table for the
q204 oracle, in the engine's x,y,z axis order (reverse of zarr's C-order).
"""
import json, os, sys, zlib, gzip
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/zarr_golden"


def write_array(path, arr, chunks, dtype, compress, zarray_extra):
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    meta.update(zarray_extra)
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, indent=1)
    sep = zarray_extra.get("dimension_separator", ".")
    grids = [range((s + c - 1) // c) for s, c in zip(arr.shape, chunks)]
    import itertools
    rows = []
    for idx in itertools.product(*grids):
        # full-size chunk, edge-padded with fill (zarr stores FULL chunks)
        full = np.zeros(chunks, dtype=arr.dtype)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, arr.shape))
        sub = arr[sl]
        full[tuple(slice(0, d) for d in sub.shape)] = sub
        key = sep.join(str(i) for i in idx)
        p = os.path.join(path, key)
        os.makedirs(os.path.dirname(p), exist_ok=True) if sep == "/" and "/" in key else None
        payload = full.astype(dtype).tobytes(order="C")
        with open(p, "wb") as f:
            f.write(compress(payload))
        # golden row in ENGINE axis order (x fastest): reverse zarr order
        gx, gy, gz = (list(reversed(idx)) + [0, 0])[:3]
        sx, sy, sz = (list(reversed(sub.shape)) + [1, 1])[:3]
        rows.append((gx, gy, gz, sx, sy, sz, sub.size,
                     int(sub.astype(np.int64).sum())))
    return rows


# --- vol ---------------------------------------------------------------
z, y, x = np.meshgrid(np.arange(5), np.arange(7), np.arange(11),
                      indexing="ij")
vol = ((1000 * z + 57 * y + 13 * x) % 65536).astype(np.uint16)
rows = write_array(os.path.join(out, "vol"), vol, (2, 3, 4), "<u2",
                   lambda b: zlib.compress(b, 6),
                   {"compressor": {"id": "zlib", "level": 6}})

# --- sparse ------------------------------------------------------------
sp = (np.arange(16, dtype=np.float32) * 0.5).reshape(4, 4)
write_array(os.path.join(out, "sparse"), sp, (2, 2), "<f4",
            lambda b: gzip.compress(b, 5),
            {"compressor": {"id": "gzip", "level": 5},
             "dimension_separator": "/"})
os.remove(os.path.join(out, "sparse", "1", "1"))

print("golden rows for q204 (gx,gy,gz,sx,sy,sz,n,checksum):")
for r in sorted(rows):
    print("  (%d, %d, %d, %d, %d, %d, %d, %d)," % r)
print("total checksum:", sum(r[7] for r in rows),
      "n:", sum(r[6] for r in rows))
