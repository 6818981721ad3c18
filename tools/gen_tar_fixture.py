#!/usr/bin/env python3
"""Golden tar fixture for TarIO — written by Python's INDEPENDENT stdlib
tarfile implementation (the gen_zarr_fixture/gen_ngff_fixture discipline:
the engine's reader is checked against bytes it did not produce). Emits a
USTAR shard in the WebDataset layout (adjacent {key}.jpg/{key}.json
members, plus a directory member and a pax header the reader must SKIP)
and a JSON manifest of (name, size, sha256) for the spec to pin.

Also validates the OTHER direction when given a file argument: reads a
TarIO-written archive with tarfile and prints its members — run manually
or from the spec-side check to prove our writer's bytes parse under an
independent implementation.

Usage: python3 tools/gen_tar_fixture.py            # (re)write the fixture
       python3 tools/gen_tar_fixture.py <file.tar> # validate foreign tar
"""
import hashlib
import io
import json
import os
import sys
import tarfile

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "fixtures", "tar_golden")


def deterministic_bytes(seed: int, n: int) -> bytes:
    return bytes(((i * 2654435761 + seed * 40503) >> 16) & 0xFF
                 for i in range(n))


def gen() -> None:
    os.makedirs(OUT, exist_ok=True)
    buf = io.BytesIO()
    # USTAR format, fixed mtime for determinism
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("samples/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        manifest = []
        for key in range(5):
            img = deterministic_bytes(key, 300 + 97 * key)  # off-block sizes
            meta = json.dumps({"id": key, "label": f"c{key % 3}"}).encode()
            for name, data in ((f"samples/{key:04d}.jpg", img),
                               (f"samples/{key:04d}.json", meta)):
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                ti.mtime = 0
                tf.addfile(ti, io.BytesIO(data))
                manifest.append({"name": name, "size": len(data),
                                 "sha256": hashlib.sha256(data).hexdigest()})
    data = buf.getvalue()
    with open(os.path.join(OUT, "shard.tar"), "wb") as f:
        f.write(data)
    # a PAX variant of the same content: the reader must skip 'x' members
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w", format=tarfile.PAX_FORMAT) as tf:
        ti = tarfile.TarInfo("samples/0000.jpg")
        payload = deterministic_bytes(0, 300)
        ti.size = len(payload)
        ti.mtime = 0
        ti.pax_headers = {"comment": "pax member precedes"}
        tf.addfile(ti, io.BytesIO(payload))
    with open(os.path.join(OUT, "shard_pax.tar"), "wb") as f:
        f.write(buf2.getvalue())
    # a USTAR member whose path exceeds 100 chars: tarfile splits it into
    # the prefix field (offset 345) — readers that ignore prefix silently
    # truncate the name
    buf3 = io.BytesIO()
    with tarfile.open(fileobj=buf3, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        long_name = "/".join(["deeply"] * 18) + "/sample.bin"  # ~130 chars
        ti = tarfile.TarInfo(long_name)
        payload = deterministic_bytes(7, 64)
        ti.size = len(payload)
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(payload))
    with open(os.path.join(OUT, "shard_prefix.tar"), "wb") as f:
        f.write(buf3.getvalue())
    # a name that exceeds even USTAR's 100+155 name+prefix capacity:
    # tarfile emits a pax 'x' member whose `path=` record carries the
    # real name — readers that skip pax members silently surface the
    # truncated placeholder instead
    buf4 = io.BytesIO()
    with tarfile.open(fileobj=buf4, mode="w", format=tarfile.PAX_FORMAT) as tf:
        very_long = "/".join(["component%03d" % i for i in range(24)]) \
            + "/really_long_webdataset_key_sample.bin"  # ~350 chars
        assert len(very_long) > 255, len(very_long)
        ti = tarfile.TarInfo(very_long)
        payload = deterministic_bytes(11, 200)
        ti.size = len(payload)
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(payload))
        # a normal member AFTER it: the override must apply to exactly
        # one member, not leak forward
        ti2 = tarfile.TarInfo("after.bin")
        payload2 = deterministic_bytes(13, 32)
        ti2.size = len(payload2)
        ti2.mtime = 0
        tf.addfile(ti2, io.BytesIO(payload2))
    with open(os.path.join(OUT, "shard_paxlong.tar"), "wb") as f:
        f.write(buf4.getvalue())
    with open(os.path.join(OUT, "paxlong_name.txt"), "w") as f:
        f.write(very_long)
    # the GNU convention for the same problem: an 'L' member whose
    # payload is the next member's full name
    buf5 = io.BytesIO()
    with tarfile.open(fileobj=buf5, mode="w", format=tarfile.GNU_FORMAT) as tf:
        gnu_long = "gnu/" + "/".join("segment%02d" % i for i in range(14)) \
            + "/gnu_longname_sample.bin"  # ~180 chars, > the 100-char name field
        assert len(gnu_long) > 100, len(gnu_long)
        ti = tarfile.TarInfo(gnu_long)
        payload = deterministic_bytes(17, 96)
        ti.size = len(payload)
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(payload))
        ti2 = tarfile.TarInfo("short.bin")
        payload2 = deterministic_bytes(19, 48)
        ti2.size = len(payload2)
        ti2.mtime = 0
        tf.addfile(ti2, io.BytesIO(payload2))
    with open(os.path.join(OUT, "shard_gnulong.tar"), "wb") as f:
        f.write(buf5.getvalue())
    with open(os.path.join(OUT, "gnulong_name.txt"), "w") as f:
        f.write(gnu_long)
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {OUT}: shard.tar ({len(data)} B), shard_pax.tar, manifest")


def validate(path: str) -> None:
    with tarfile.open(path, mode="r:") as tf:
        for m in tf.getmembers():
            data = tf.extractfile(m).read() if m.isfile() else b""
            print(m.name, m.size, hashlib.sha256(data).hexdigest())


if __name__ == "__main__":
    if len(sys.argv) > 1:
        validate(sys.argv[1])
    else:
        gen()
