#!/usr/bin/env python3
"""Vectorized numpy ports of the Spark hash functions the engine's LLM
operators are built on — xxHash64 (seed 42) over short byte strings and int
pairs, and Murmur3 over long arrays — bit-validated at import time against
constants pinned from the engine itself (OracleHashSpec pins the same
values engine-side; LlmHashOracles' DuckDB chains replay them in SQL for
the sf0.01 driver gate; these ports exist so the sf1+ sweeps replay the
hash-oracle rows in seconds instead of DuckDB-lambda hours).

Scope matches OracleHash: string inputs ≤ 31 bytes (the no-stripe xxHash64
path). Longer input raises — loud, never silently wrong.
"""
import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
_SEED = np.uint64(42)

_old = np.seterr(over="ignore")  # uint64 wraparound is the point


def _rotl64(x, r):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(h):
    h = (h ^ (h >> np.uint64(33))) * _P2
    h = (h ^ (h >> np.uint64(29))) * _P3
    return h ^ (h >> np.uint64(32))


def xxh64_short(data, lengths):
    """Vectorized xxHash64(seed 42) of N byte strings given as a padded
    uint8 matrix `data` (N×32, zero-padded) and `lengths` (N,) ≤ 31.
    Returns int64 (Spark-signed) array.
    """
    n = np.asarray(lengths, dtype=np.int64)
    if n.size and int(n.max()) > 31:
        raise ValueError(f"xxh64_short caps at 31 bytes, got {int(n.max())}")
    d = np.asarray(data, dtype=np.uint64)  # N×32
    idx = np.arange(32, dtype=np.int64)
    valid = idx[None, :] < n[:, None]
    d = np.where(valid, d, np.uint64(0))
    # little-endian 8-byte words w0..w3 (w3 only feeds the 4-byte/tail path)
    shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64))
    words = [(d[:, i * 8:(i + 1) * 8] << shifts[None, :]).sum(axis=1, dtype=np.uint64)
             for i in range(4)]
    h = _SEED + _P5 + n.astype(np.uint64)
    nw = n // 8
    for i in range(3):
        t = _rotl64(words[i] * _P2, 31) * _P1
        h2 = _rotl64(h ^ t, 27) * _P1 + _P4
        h = np.where(nw > i, h2, h)
    # 4-byte chunk at offset nw*8 when n%8 >= 4: little-endian 4 bytes
    off = (n // 8) * 8
    gather = np.clip(off[:, None] + idx[None, :4], 0, 31)
    b4 = np.take_along_axis(d, gather.astype(np.int64), axis=1)
    k4 = (b4 << shifts[None, :4]).sum(axis=1, dtype=np.uint64)
    h4 = _rotl64(h ^ (k4 * _P1), 23) * _P2 + _P3
    took4 = (n % 8) >= 4
    h = np.where(took4, h4, h)
    boff = off + np.where(took4, 4, 0)
    for j in range(3):
        gi = np.clip(boff + j, 0, 31)
        b = d[np.arange(d.shape[0]), gi]
        hb = _rotl64(h ^ (b * _P5), 11) * _P1
        h = np.where(n - boff > j, hb, h)
    return _fmix64(h).astype(np.int64)


def hash_strings(strs):
    """xxHash64(seed 42) of an iterable of ASCII strings (each ≤ 31 bytes)
    → int64 array. Matches Spark's xxhash64(string).
    """
    bs = [s.encode("utf-8") for s in strs]
    if any(len(b) != len(s) for b, s in zip(bs, strs)):
        raise ValueError("non-ASCII input outside replay scope")
    n = len(bs)
    data = np.zeros((n, 32), dtype=np.uint8)
    lengths = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    for i, b in enumerate(bs):
        data[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    return xxh64_short(data, lengths)


def _hash_int(i, seed):
    """Spark XXH64.hashInt over uint64 arrays; i non-negative < 2^32."""
    h = seed + _P5 + np.uint64(4)
    h = h ^ (np.asarray(i, dtype=np.uint64) * _P1)
    h = _rotl64(h, 23) * _P2 + _P3
    return _fmix64(h)


def xxh64_int_pair(a, b):
    """Spark xxhash64(int a, int b) → int64 array."""
    return _hash_int(b, _hash_int(a, _SEED)).astype(np.int64)


_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mm_hash_long(l, seed):
    """Murmur3_x86_32.hashLong over arrays; l int64, seed uint32 array."""
    with np.errstate(over="ignore"):
        u = np.asarray(l).astype(np.uint64)
        lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (u >> np.uint64(32)).astype(np.uint32)
        h1 = np.asarray(seed, dtype=np.uint32)
        for k in (lo, hi):
            k1 = _rotl32(k * _C1, 15) * _C2
            h1 = _rotl32(h1 ^ k1, 13) * np.uint32(5) + np.uint32(0xE6546B64)
        h1 ^= np.uint32(8)
        h1 ^= h1 >> np.uint32(16)
        h1 *= np.uint32(0x85EBCA6B)
        h1 ^= h1 >> np.uint32(13)
        h1 *= np.uint32(0xC2B2AE35)
        h1 ^= h1 >> np.uint32(16)
    return h1


def murmur3_long_rows(mat):
    """Spark hash(array<bigint>) (seed 42) over each ROW of an int64 matrix
    → int32 array.
    """
    m = np.asarray(mat, dtype=np.int64)
    h = np.full(m.shape[0], 42, dtype=np.uint32)
    for c in range(m.shape[1]):
        h = _mm_hash_long(m[:, c], h)
    return h.astype(np.int32)


# ------------------------------------------------------- import-time pins
def _selftest():
    got = hash_strings(["", "a", "hello world", "abcdefghijklmnopqrst",
                        "spark dedup corpus shingles"])
    want = [-7444071767201028348, -8582455328737087284, 7620854247404556961,
            8917572861163453528, 2540946299439953782]
    assert got.tolist() == want, f"xxh64_short drifted: {got.tolist()}"
    got2 = xxh64_int_pair(np.array([0, 5, 123456789]), np.array([0, 63, 7]))
    want2 = [1151812168208346021, -778342267217574980, 993202015102190721]
    assert got2.tolist() == want2, f"xxh64_int_pair drifted: {got2.tolist()}"
    assert murmur3_long_rows(np.array([[1]])).tolist() == [-1712319331]
    assert murmur3_long_rows(np.array([[1, 2, 3]])).tolist() == [1045631400]
    assert murmur3_long_rows(np.array(
        [[17, 2038074742, 0, 55, 1, 999999999, 123, 456]])).tolist() == [43442689]
    assert murmur3_long_rows(np.array(
        [[-9223372036854775808, 982451653]])).tolist() == [1910008088]


_selftest()
