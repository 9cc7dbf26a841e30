"""128-bit hash implementations behind the Alembic writer (native/hashes.cpp).

MurmurHash3_x64_128 golden vectors were generated from the canonical Appleby
implementation (the copy vendored by scikit-learn at
sklearn/utils/src/MurmurHash3.cpp, compiled with g++ and run in-repo); each
vector is ``(message, seed) -> digest bytes`` where digest bytes are the two
output u64 words packed little-endian — exactly what Alembic memcpys into the
16-byte ArraySample key. SpookyHash V2 has no independent oracle in this
environment (no egress); the C++ and pure-Python transcriptions were written
independently from the published algorithm and are checked against each other
across all length regimes (short path <192 B with its 0/1-3/4-7/8/9-11/12/
13-15 remainder cases, the >=16-byte short-loop, and the 96-byte-block long
path).
"""

import struct

import pytest

from motion324_tpu import native as nat

# (message bytes, seed) -> %016llx%016llx rendering of (out[0], out[1]) from
# the canonical C++ implementation
_MM_VECTORS = [
    (b"", 0, "00000000000000000000000000000000"),
    (b"", 1, "4610abe56eff5cb551622daa78f83583"),
    (b"", 4, "cfa0f7ddd84c76bc589623161cf526f1"),
    (b"", 8, "28df63b7cc57c3cbf2557dfcc4e8fe52"),
    (b"", 12, "a4d8ece9d7c0dfe3803bbf8eb6f0853f"),
    (b"", 1234567, "78f3ae6fea7fd00aed426dcd0d6b2dea"),
    (b"a", 0, "85555565f6597889e6b53a48510e895a"),
    (b"a", 8, "ba62ce73c6757b4b111dff8c4e36b172"),
    (b"abc", 0, "b4963f3f3fad78673ba2744126ca2d52"),
    (b"abc", 8, "0d5c562b8c8bcdf0c172406cf1fe7af0"),
    (b"hello world, this is murmur3 x64 128", 12,
     "f6997cf2ec3e904dc5cde3206bfa88ca"),
    (b"0123456789abcdef", 1, "fdff0577812ebb4112c6078b2336aae6"),
    (b"0123456789abcdef0", 1234567, "9e4a0e4938e9ee008eafa0d28a15ce45"),
    (b"The quick brown fox jumps over the lazy dog", 0,
     "e34bbc7bbc071b6c7a433ca9c49a9347"),
    (b"The quick brown fox jumps over the lazy dog", 4,
     "0fab0b8b1025e16f53c0282ea6e4e9fa"),
]
_BIN = bytes((i * 37 + 11) % 256 for i in range(257))
_MM_VECTORS += [
    (_BIN[:15], 4, "1dfc99d16bbed05f1f0097dfe421f40a"),
    (_BIN[:16], 4, "74d40d41c4645b4e2f69ef2d3eb656f9"),
    (_BIN[:31], 4, "6d604445ad4b09c5c88b545a27339fab"),
    (_BIN[:33], 4, "6becb717f0672029daaa643c41857775"),
    (_BIN[:256], 4, "f580c49e5cfb847446b636a4caf59a04"),
    (_BIN[:257], 4, "484a616c669b5c01dbe5d62fa9280cc5"),
]


def _digest_bytes(hex32: str) -> bytes:
    return struct.pack("<QQ", int(hex32[:16], 16), int(hex32[16:], 16))


@pytest.mark.parametrize("impl", ["native", "python"])
def test_murmur3_x64_128_golden(impl):
    fn = (nat.murmur3_x64_128 if impl == "native"
          else nat.murmur3_x64_128_numpy)
    if impl == "native" and not nat.native_available():
        pytest.skip("native library unavailable")
    for msg, seed, hexd in _MM_VECTORS:
        assert fn(msg, seed) == _digest_bytes(hexd), (msg[:24], seed)


def test_spooky_cpp_python_parity():
    if not nat.native_available():
        pytest.skip("native library unavailable")
    import random
    rng = random.Random(0)
    lengths = [0, 1, 3, 4, 7, 8, 9, 11, 12, 13, 15, 16, 17, 31, 32, 33, 47,
               63, 95, 96, 97, 191, 192, 193, 200, 287, 288, 289, 1000, 4096]
    for n in lengths:
        data = bytes(rng.randrange(256) for _ in range(n))
        for s1, s2 in [(0, 0), (1, 2), (0xDEADBEEF, 42)]:
            assert nat.spooky_hash128(data, s1, s2) == \
                nat.spooky_hash128_numpy(data, s1, s2), (n, s1, s2)


def test_spooky_basic_properties():
    h = nat.spooky_hash128
    assert len(h(b"")) == 16
    assert h(b"x") != h(b"y")
    assert h(b"x", 0, 0) != h(b"x", 1, 0)
    # one-bit avalanche: digests differ across a block boundary change
    big = b"\x00" * 300
    flip = b"\x00" * 150 + b"\x01" + b"\x00" * 149
    assert h(big) != h(flip)
