"""Sharded Bloom URL-seen prefilter.

The reference's dedup structure is a dict keyed by the canonical URL
(/root/reference/boris/interpreter/browser-services.rkt:44-46). At 10^10-URL
scale the exact seen table is too big to broadcast, so the engine keeps one
Bloom bitset per ``host_bucket`` shard, rebuilt incrementally per round from
that round's seen-delta (OR of bitsets is associative, so deltas fold in).

Candidate URLs are pre-filtered against their shard's bitset; only
*maybe-seen* candidates reach the exact anti-join, shrinking its build side.
Bitsets live in a tiny DataFrame ``(bucket, bitset binary)`` that broadcasts
to the candidate join. With B=256 shards of 1 MiB each the broadcast is
256 MiB worst-case at design scale; the sandbox uses far smaller shards.

All membership math runs on numpy uint64 arrays inside Arrow batches — no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# k independent probe positions derived from the 64-bit url hash via
# splitmix64 steps — cheap and adequate for a prefilter.
_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _probes(hashes: np.ndarray, k: int, m_bits: int) -> list[np.ndarray]:
    """k probe bit-positions per hash; hashes uint64, m_bits power of two."""
    mask = np.uint64(m_bits - 1)
    out = []
    h = hashes.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        for _ in range(k):
            h = h + _SPLITMIX_GAMMA
            z = h.copy()
            z ^= z >> np.uint64(30)
            z *= np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(27)
            z *= np.uint64(0x94D049BB133111EB)
            z ^= z >> np.uint64(31)
            out.append((z & mask).astype(np.int64))
    return out


def build_bitset(hashes: np.ndarray, m_bits: int, k: int) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for pos in _probes(hashes.astype(np.uint64), k, m_bits):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes()


def merge_bitsets(a: bytes | None, b: bytes | None) -> bytes | None:
    if a is None:
        return b
    if b is None:
        return a
    return np.bitwise_or(
        np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


def might_contain(hashes: np.ndarray, bitset: bytes | None, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership test; None bitset → all False (nothing seen)."""
    if bitset is None:
        return np.zeros(len(hashes), dtype=bool)
    bits = np.frombuffer(bitset, dtype=np.uint8)
    result = np.ones(len(hashes), dtype=bool)
    for pos in _probes(hashes.astype(np.uint64), k, m_bits):
        result &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return result


class BloomShardStore:
    """Driver-held shard map {bucket: bitset bytes}, folded per round.

    Shipped to executors via ``sparkContext.broadcast`` (re-broadcast per
    round by the crawler as the shards grow; the previous broadcast is
    unpersisted) — one torrent-distributed copy per executor, not one copy
    per task closure.
    """

    def __init__(self, n_buckets: int, m_bits: int = 1 << 20, k: int = 5):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.n_buckets = n_buckets
        self.m_bits = m_bits
        self.k = k
        self.shards: dict[int, bytes] = {}

    def add_delta(self, delta: pd.DataFrame) -> None:
        """delta: DataFrame with columns (bucket, url_hash)."""
        for bucket, grp in delta.groupby("bucket"):
            bs = build_bitset(
                grp["url_hash"].to_numpy().astype(np.uint64), self.m_bits, self.k
            )
            self.shards[int(bucket)] = merge_bitsets(self.shards.get(int(bucket)), bs)

    def merge_shard(self, bucket: int, bits: bytes) -> None:
        """Fold one pre-built shard bitset in (the distributed-fold path:
        executors build per-bucket bitsets, the driver only ORs them)."""
        self.shards[int(bucket)] = merge_bitsets(self.shards.get(int(bucket)), bits)

    def filter_frame(self, pdf: pd.DataFrame) -> np.ndarray:
        """Vector of maybe-seen booleans for (bucket, url_hash) rows."""
        result = np.zeros(len(pdf), dtype=bool)
        if not self.shards or pdf.empty:
            return result
        buckets = pdf["bucket"].to_numpy()
        hashes = pdf["url_hash"].to_numpy().astype(np.uint64)
        for bucket in np.unique(buckets):
            m = buckets == bucket
            result[m] = might_contain(
                hashes[m], self.shards.get(int(bucket)), self.m_bits, self.k
            )
        return result
