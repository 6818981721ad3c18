#!/usr/bin/env python3
"""Generate the checked-in zarr v3 golden fixture at fixtures/zarr3_golden/.

INDEPENDENT writer: implements the public zarr v3 core + sharding specs
(zarr-specs v3: zarr.json array metadata, regular chunk grids, default /
v2 chunk-key encodings, `bytes`/`gzip`/`crc32c` codecs, and the
`sharding_indexed` codec with its u64-pair index) directly with numpy +
json + gzip + a table-driven CRC32C — no zarr import — so the engine's
reader is validated against a second implementation of the spec, not
against itself (the gen_zarr_fixture discipline).

Arrays:
  vol  — 3-D uint16, shape [5,6,8] (z,y,x C-order), SHARDED: shard
         chunk_shape [2,4,4], inner chunks [1,2,2] (so 2x2x2 inner
         chunks per shard), default "/" key encoding ("c/z/y/x" SHARD
         keys), inner codec chain [bytes LE, gzip, crc32c], index
         codecs [bytes LE, crc32c] at index_location "end".
         v(z,y,x) = (100*z + 17*y + 3*x + 7) % 65536 (never 0, so a
         fill-reconstructed chunk is distinguishable).
         Inner chunk (z=1,y=0,x=0 LOCAL) of shard c/0/0/0 is MISSING
         (all-ones index entry -> engine reads fill zeros), and shard
         c/2/1/1 is missing ENTIRELY (its inner grids list no rows).
  flat — 2-D float32, shape [4,5] (z,x), NON-sharded chunks [2,3],
         "v2" chunk-key encoding with "." separator (keys "0.0"),
         codecs [bytes BIG-endian, gzip, crc32c].
Rejects:
  transpose/ — codecs lead with "transpose" (loud reject)
  fillbad/   — fill_value 7 (loud reject: fill-0 reconstruction only)

Prints the per-inner-chunk golden (gx,gy,gz,sx,sy,sz,n,checksum) table
for the q231 oracle, in the engine's x,y,z axis order.
"""
import gzip
import itertools
import json
import os
import struct
import sys

import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/zarr3_golden"

# ---- CRC32C (Castagnoli), table-driven, reflected poly 0x82F63B78 ----
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


def with_crc(data: bytes) -> bytes:
    return data + struct.pack("<I", crc32c(data))


def gz(data: bytes) -> bytes:
    return gzip.compress(data, 6)


def meta_common(shape, dtype, chunk_shape, codecs, key_encoding):
    return {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": dtype,
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunk_shape)}},
        "chunk_key_encoding": key_encoding,
        "fill_value": 0,
        "codecs": codecs,
        "attributes": {"pixelResolution": {"unit": "pixel",
                                           "dimensions": [1.0, 1.0, 1.0]}},
    }


def gen():
    os.makedirs(out, exist_ok=True)

    # ---------------- vol: sharded uint16 ----------------
    shape = (5, 6, 8)          # z, y, x
    outer = (2, 4, 4)          # shard shape (voxels)
    inner = (1, 2, 2)          # inner chunk shape (voxels)
    cps = tuple(o // i for o, i in zip(outer, inner))
    z, y, x = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                          np.arange(shape[2]), indexing="ij")
    vol = ((100 * z + 17 * y + 3 * x + 7) % 65536).astype("<u2")

    vol_dir = os.path.join(out, "vol")
    os.makedirs(vol_dir, exist_ok=True)
    meta = meta_common(
        shape, "uint16", outer,
        [{"name": "sharding_indexed",
          "configuration": {
              "chunk_shape": list(inner),
              "codecs": [
                  {"name": "bytes", "configuration": {"endian": "little"}},
                  {"name": "gzip", "configuration": {"level": 6}},
                  {"name": "crc32c"}],
              "index_codecs": [
                  {"name": "bytes", "configuration": {"endian": "little"}},
                  {"name": "crc32c"}],
              "index_location": "end"}}],
        {"name": "default", "configuration": {"separator": "/"}})
    with open(os.path.join(vol_dir, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1)

    missing_inner = {((0, 0, 0), (1, 0, 0))}   # (shard grid, local grid)
    missing_shard = {(2, 1, 1)}
    shard_grid = [range((s + o - 1) // o) for s, o in zip(shape, outer)]
    inner_grid_dims = tuple((s + i - 1) // i for s, i in zip(shape, inner))
    golden = []
    for sg in itertools.product(*shard_grid):
        if sg in missing_shard:
            continue
        chunks = []
        index = []
        offset = 0
        for loc in itertools.product(*[range(c) for c in cps]):
            ig = tuple(sg[d] * cps[d] + loc[d] for d in range(3))
            in_bounds = all(ig[d] < inner_grid_dims[d] for d in range(3))
            if not in_bounds or (sg, loc) in missing_inner:
                index.append((0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF))
                continue
            # full fill-padded inner chunk
            full = np.zeros(inner, dtype="<u2")
            z0, y0, x0 = (ig[d] * inner[d] for d in range(3))
            sz = tuple(min(inner[d], shape[d] - ig[d] * inner[d])
                       for d in range(3))
            full[:sz[0], :sz[1], :sz[2]] = \
                vol[z0:z0 + sz[0], y0:y0 + sz[1], x0:x0 + sz[2]]
            enc = with_crc(gz(full.tobytes()))
            chunks.append(enc)
            index.append((offset, len(enc)))
            offset += len(enc)
        idx_bytes = b"".join(struct.pack("<QQ", o, n) for o, n in index)
        shard_bytes = b"".join(chunks) + with_crc(idx_bytes)
        key_dir = os.path.join(vol_dir, "c", str(sg[0]), str(sg[1]))
        os.makedirs(key_dir, exist_ok=True)
        with open(os.path.join(key_dir, str(sg[2])), "wb") as f:
            f.write(shard_bytes)
        # golden rows (engine x,y,z order) for every in-bounds inner grid
        for loc in itertools.product(*[range(c) for c in cps]):
            ig = tuple(sg[d] * cps[d] + loc[d] for d in range(3))
            if not all(ig[d] < inner_grid_dims[d] for d in range(3)):
                continue
            sz = tuple(min(inner[d], shape[d] - ig[d] * inner[d])
                       for d in range(3))
            if (sg, loc) in missing_inner:
                checksum = 0
            else:
                z0, y0, x0 = (ig[d] * inner[d] for d in range(3))
                checksum = int(vol[z0:z0 + sz[0], y0:y0 + sz[1],
                                   x0:x0 + sz[2]].astype(np.int64).sum())
            # engine order: gx,gy,gz = reversed zarr ig; sx,sy,sz reversed
            golden.append((ig[2], ig[1], ig[0], sz[2], sz[1], sz[0],
                           sz[0] * sz[1] * sz[2], checksum))
    golden.sort()

    # ---------------- flat: non-sharded float32, big-endian, "." keys --
    fshape = (4, 5)
    fchunks = (2, 3)
    fz, fx = np.meshgrid(np.arange(fshape[0]), np.arange(fshape[1]),
                         indexing="ij")
    fvol = (fz * 10 + fx + 0.5).astype(">f4")
    flat_dir = os.path.join(out, "flat")
    os.makedirs(flat_dir, exist_ok=True)
    fmeta = meta_common(
        fshape, "float32", fchunks,
        [{"name": "bytes", "configuration": {"endian": "big"}},
         {"name": "gzip", "configuration": {"level": 6}},
         {"name": "crc32c"}],
        {"name": "v2", "configuration": {"separator": "."}})
    with open(os.path.join(flat_dir, "zarr.json"), "w") as f:
        json.dump(fmeta, f, indent=1)
    for gy_, gx_ in itertools.product(
            range((fshape[0] + fchunks[0] - 1) // fchunks[0]),
            range((fshape[1] + fchunks[1] - 1) // fchunks[1])):
        full = np.zeros(fchunks, dtype=">f4")
        z0, x0 = gy_ * fchunks[0], gx_ * fchunks[1]
        sz = (min(fchunks[0], fshape[0] - z0), min(fchunks[1], fshape[1] - x0))
        full[:sz[0], :sz[1]] = fvol[z0:z0 + sz[0], x0:x0 + sz[1]]
        with open(os.path.join(flat_dir, f"{gy_}.{gx_}"), "wb") as f:
            f.write(with_crc(gz(full.tobytes())))

    # ---------------- rejects ----------------
    tr_dir = os.path.join(out, "transpose")
    os.makedirs(tr_dir, exist_ok=True)
    tmeta = meta_common(
        (4, 4), "uint8", (2, 2),
        [{"name": "transpose", "configuration": {"order": [1, 0]}},
         {"name": "bytes", "configuration": {"endian": "little"}}],
        {"name": "default", "configuration": {"separator": "/"}})
    with open(os.path.join(tr_dir, "zarr.json"), "w") as f:
        json.dump(tmeta, f, indent=1)

    fb_dir = os.path.join(out, "fillbad")
    os.makedirs(fb_dir, exist_ok=True)
    bmeta = meta_common(
        (4, 4), "uint8", (2, 2),
        [{"name": "bytes", "configuration": {"endian": "little"}}],
        {"name": "default", "configuration": {"separator": "/"}})
    bmeta["fill_value"] = 7
    with open(os.path.join(fb_dir, "zarr.json"), "w") as f:
        json.dump(bmeta, f, indent=1)

    print(f"wrote {out}: vol (sharded, {len(golden)} inner chunks), "
          f"flat, transpose/fillbad rejects")
    print("q231 golden rows (gx, gy, gz, sx, sy, sz, n, checksum):")
    for r in golden:
        print("  (%d, %d, %d, %d, %d, %d, %d, %d)," % r)
    # flat golden: per-chunk float sums for the spec
    print("flat golden (gx, gz, sum):")
    for gy_, gx_ in itertools.product(
            range((fshape[0] + fchunks[0] - 1) // fchunks[0]),
            range((fshape[1] + fchunks[1] - 1) // fchunks[1])):
        z0, x0 = gy_ * fchunks[0], gx_ * fchunks[1]
        sz = (min(fchunks[0], fshape[0] - z0), min(fchunks[1], fshape[1] - x0))
        s = float(fvol[z0:z0 + sz[0], x0:x0 + sz[1]].astype(np.float64).sum())
        print(f"  ({gx_}, {gy_}, {s}),")


def gen_big(dest):
    """Multi-MB-shard store for the r19 ranged-read pin (NOT checked in —
    Zarr3Spec generates it into a temp dir). Two 8 MiB shards: uint16
    [64,256,256] (z,y,x), shard [32,256,256], inner chunks [8,64,64]
    (4x4x4 = 64 inner chunks of 64 KiB per shard). Inner codecs
    [bytes LE] only (raw — on-disk shard size == raw size, so a
    whole-shard read is unmistakable in a byte counter); index
    [bytes LE, crc32c] at "end". v(z,y,x) = (131z + 17y + 3x + 5) % 65536.
    """
    shape = (64, 256, 256)
    outer = (32, 256, 256)
    inner = (8, 64, 64)
    cps = tuple(o // i for o, i in zip(outer, inner))
    z, y, x = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                          np.arange(shape[2]), indexing="ij")
    vol = ((131 * z + 17 * y + 3 * x + 5) % 65536).astype("<u2")
    os.makedirs(dest, exist_ok=True)
    meta = meta_common(
        shape, "uint16", outer,
        [{"name": "sharding_indexed",
          "configuration": {
              "chunk_shape": list(inner),
              "codecs": [
                  {"name": "bytes", "configuration": {"endian": "little"}}],
              "index_codecs": [
                  {"name": "bytes", "configuration": {"endian": "little"}},
                  {"name": "crc32c"}],
              "index_location": "end"}}],
        {"name": "default", "configuration": {"separator": "/"}})
    with open(os.path.join(dest, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1)
    for sg in itertools.product(*[range((s + o - 1) // o)
                                  for s, o in zip(shape, outer)]):
        chunks, index, offset = [], [], 0
        for loc in itertools.product(*[range(c) for c in cps]):
            ig = tuple(sg[d] * cps[d] + loc[d] for d in range(3))
            z0, y0, x0 = (ig[d] * inner[d] for d in range(3))
            enc = vol[z0:z0 + inner[0], y0:y0 + inner[1],
                      x0:x0 + inner[2]].tobytes()
            chunks.append(enc)
            index.append((offset, len(enc)))
            offset += len(enc)
        idx_bytes = b"".join(struct.pack("<QQ", o, n) for o, n in index)
        shard_bytes = b"".join(chunks) + with_crc(idx_bytes)
        key_dir = os.path.join(dest, "c", str(sg[0]), str(sg[1]))
        os.makedirs(key_dir, exist_ok=True)
        with open(os.path.join(key_dir, str(sg[2])), "wb") as f:
            f.write(shard_bytes)
    print(f"wrote {dest}: 2 shards of "
          f"{32 * 256 * 256 * 2 + 64 * 16 + 4} B each")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--big":
        gen_big(sys.argv[2])
    else:
        gen()
