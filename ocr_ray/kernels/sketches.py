"""Near-duplicate sketches: shingling, MinHash, SimHash, n-gram Jaccard.

Standard published constructions (Broder 1997 minwise hashing; Charikar 2002
simhash; Leskovec et al. MMDS ch.3 LSH banding) — no counterpart in the
reference repo; required by the training-data operator suite. Pure and
deterministic (fixed hash seeds), so Ray distribution cannot change results.
"""

from __future__ import annotations

import hashlib
import struct

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def _stable_hash64(data: bytes) -> int:
    """Deterministic 64-bit hash: big-endian first 8 bytes of md5.

    md5 (not blake2b) so a SQL engine can recompute it exactly —
    DuckDB: ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` — which is what
    makes the MinHash/SimHash oracle queries possible."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def word_shingles(text: str, n: int = 3) -> set[bytes]:
    """Set of word n-gram shingles of the lowercased text."""
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words).encode()} if words else set()
    return {" ".join(words[i : i + n]).encode() for i in range(len(words) - n + 1)}


def char_ngrams(text: str, n: int = 5) -> set[str]:
    """Set of character n-grams of the normalized text."""
    s = " ".join(text.lower().split())
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _minhash_params(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) per permutation derived from blake2b(seed, i)."""
    params = []
    for i in range(num_perm):
        digest = hashlib.blake2b(
            struct.pack("<QQ", seed, i), digest_size=16
        ).digest()
        a, b = struct.unpack("<QQ", digest)
        params.append((a % _MERSENNE or 1, b % _MERSENNE))
    return params


_PARAM_CACHE: dict[tuple[int, int], list[tuple[int, int]]] = {}


_VPARAM_CACHE: dict[tuple[int, int], tuple] = {}


def minhash_signature(shingles: set[bytes], num_perm: int = 64, seed: int = 1) -> list[int]:
    """MinHash signature: min over shingles of (a*h + b) mod p, truncated to
    32 bits. Empty input yields the all-MAX signature.

    The (a*h + b) mod 2^61-1 inner product runs as EXACT vectorized uint64
    numpy (the 122-bit product is computed as four 31/30-bit partial
    products folded with 2^61 ≡ 1 (mod p)) — bit-identical to the Python
    big-int formula (pinned by test_kernel_sketches agreement + the SQL
    oracle, which replays the same params in HUGEINT) but ~10× faster, the
    hot kernel of every MinHash-derived query."""
    import numpy as np

    if not shingles:
        return [_MAX_HASH] * num_perm
    key = (num_perm, seed)
    vp = _VPARAM_CACHE.get(key)
    if vp is None:
        params = _PARAM_CACHE.get(key)
        if params is None:
            params = _PARAM_CACHE[key] = _minhash_params(num_perm, seed)
        a = np.array([p[0] for p in params], dtype=np.uint64).reshape(-1, 1)
        b = np.array([p[1] for p in params], dtype=np.uint64).reshape(-1, 1)
        vp = _VPARAM_CACHE[key] = (a >> np.uint64(31), a & np.uint64(0x7FFFFFFF), b)
    a_hi, a_lo, b = vp  # a = a_hi*2^31 + a_lo; a_hi < 2^30, a_lo < 2^31

    M = np.uint64(_MERSENNE)
    h = np.array([_stable_hash64(s) % _MERSENNE for s in shingles],
                 dtype=np.uint64).reshape(1, -1)
    h_hi = h >> np.uint64(31)            # < 2^30
    h_lo = h & np.uint64(0x7FFFFFFF)     # < 2^31

    def fold(x):
        # x < 2^64 → x mod-reduced below 2^61 + small (2^61 ≡ 1 mod p)
        return (x & M) + (x >> np.uint64(61))

    # a*h = a_hi*h_hi*2^62 + (a_hi*h_lo + a_lo*h_hi)*2^31 + a_lo*h_lo
    t1 = fold(a_hi * h_hi * np.uint64(2))          # 2^62 ≡ 2
    mid = fold(a_hi * h_lo + a_lo * h_hi)          # ≤ 2^62 pre-fold
    m_hi = mid >> np.uint64(30)                    # mid*2^31 = m_hi*2^61 + m_lo*2^31
    m_lo = mid & np.uint64(0x3FFFFFFF)
    t2 = m_hi + (m_lo << np.uint64(31))
    t3 = fold(a_lo * h_lo)
    x = t1 + t2 + t3 + b                           # < 5*2^61 + b — fits u64
    x = fold(fold(x))
    x = np.where(x >= M, x - M, x)
    sig = (x & np.uint64(_MAX_HASH)).min(axis=1)
    return [int(v) for v in sig]


def minhash_bands(signature: list[int], num_bands: int) -> list[int]:
    """LSH banding: hash each contiguous band of the signature to a bucket
    key. Two docs sharing any band bucket are near-dup candidates."""
    rows = len(signature) // num_bands
    keys = []
    for band in range(num_bands):
        chunk = signature[band * rows : (band + 1) * rows]
        digest = hashlib.blake2b(
            struct.pack(f"<{len(chunk) + 1}I", band, *chunk), digest_size=8
        ).digest()
        keys.append(struct.unpack("<Q", digest)[0])
    return keys


def minhash_similarity(sig_a: list[int], sig_b: list[int]) -> float:
    """Estimated Jaccard similarity = fraction of agreeing components."""
    if not sig_a:
        return 0.0
    return sum(1 for x, y in zip(sig_a, sig_b) if x == y) / len(sig_a)


def simhash64(text: str) -> int:
    """Charikar 64-bit simhash over word-level features (token + position-
    independent weight 1). The per-bit ±1 accumulation is vectorized:
    token hashes unpack to a (n, 64) bit matrix in one numpy pass —
    bit-identical to the per-bit Python loop (weights[b] > 0 ⟺
    2·ones[b] > n), ~10× faster."""
    import numpy as np

    tokens = text.lower().split()
    if not tokens:
        return 0
    h = np.array([_stable_hash64(t.encode()) for t in tokens], dtype="<u8")
    # little-endian byte view + unpackbits(bitorder='little') puts bit k of
    # the integer at column k — the same bit index as (h >> k) & 1
    bits = np.unpackbits(
        h[:, None].view(np.uint8), axis=1, bitorder="little"
    )
    ones = bits.sum(axis=0, dtype=np.int64)
    pos = 2 * ones > len(tokens)
    out = 0
    for bit in np.nonzero(pos)[0]:
        out |= 1 << int(bit)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def misra_gries(tokens, capacity: int) -> dict[str, int]:
    """Misra–Gries frequent-items summary (Misra & Gries 1982): at most
    ``capacity`` counters; every item with true frequency > n/(capacity+1)
    survives with a retained count that UNDER-estimates its true count by at
    most n/(capacity+1). Deterministic: the decrement step is a pure
    function of the stream prefix, so identical inputs give identical
    summaries on every worker.

    Used as the per-block combiner of the sketch-then-verify heavy-hitters
    operator (ops.documents.heavy_hitters); the exactness of the final
    answer comes from the verify pass, not from this bound."""
    counters: dict[str, int] = {}
    for tok in tokens:
        c = counters.get(tok)
        if c is not None:
            counters[tok] = c + 1
        elif len(counters) < capacity:
            counters[tok] = 1
        else:
            # decrement-all; drop zeros (the classic O(capacity) step,
            # amortized O(1) per stream item)
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters
