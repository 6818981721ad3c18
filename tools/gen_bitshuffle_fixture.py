#!/usr/bin/env python3
"""Independent bitshuffle fixture generator (r14, ADVICE r13 #1).

BloscCodec.bitShuffle/bitUnshuffle were previously validated only against
each other (inverse property) and hand vectors derived from the same
reading of the spec. This generator is a SECOND, independent
implementation of the published bitshuffle transform — numpy bit-matrix
ops (unpackbits/transpose/packbits), no shared code or loop structure
with the Scala kernels — over deterministic pseudorandom input. The
checked-in bytes pin the Scala kernels in BlockCodecSpec.

Semantics implemented (the bitshuffle library's documented contract, as
also stated in BloscCodec.scala's doc comment): the largest
multiple-of-8-element prefix is viewed as an [nelem x 8*typesize] bit
matrix (column p = 8*byte + bit, bits LSB-first within a byte) and
transposed; output plane p is nelem/8 bytes, byte q packing elements
8q..8q+7 LSB-first; remaining bytes verbatim.

Honest caveat: this cross-check catches indexing/loop bugs in either
implementation, but both implement the same reading of the published
layout — a true c-blosc byte-level vector would also pin the CONVENTION.
c-blosc/numcodecs/bitshuffle are not installable in this container
(zero egress); if one becomes available, regenerate with it and diff.

Usage: python3 tools/gen_bitshuffle_fixture.py  (writes fixtures/bitshuffle/)
"""
import os
import numpy as np


def bitshuffle_indep(data: bytes, typesize: int) -> bytes:
    n = len(data)
    nelem = (n // typesize) // 8 * 8
    if nelem == 0:
        return bytes(data)
    pre = np.frombuffer(data[: nelem * typesize], dtype=np.uint8)
    pre = pre.reshape(nelem, typesize)
    # (nelem, 8*typesize): column 8*b+k = bit k (LSB-first) of byte b
    bits = np.unpackbits(pre, axis=1, bitorder="little")
    planes = np.packbits(bits.T, axis=1, bitorder="little")
    return planes.tobytes() + bytes(data[nelem * typesize:])


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                           "bitshuffle")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260815)
    # 1021 bytes: a prime length so every typesize exercises a verbatim
    # tail (partial element and/or whole elements beyond the 8k prefix)
    data = rng.integers(0, 256, size=1021, dtype=np.uint8).tobytes()
    with open(os.path.join(out_dir, "input.bin"), "wb") as f:
        f.write(data)
    for ts in (1, 2, 4, 8):
        with open(os.path.join(out_dir, f"shuffled_ts{ts}.bin"), "wb") as f:
            f.write(bitshuffle_indep(data, ts))
    print("wrote fixtures/bitshuffle (input 1021 B, typesizes 1/2/4/8)")


if __name__ == "__main__":
    main()
