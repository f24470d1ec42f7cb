"""Portable Bloom filter over a JVM-hashed key column.

The 100 TB pattern this enables: a blocklist anti-join where the
blocklist is too big to broadcast would shuffle the ENTIRE corpus on
the join key. A Bloom filter of the blocklist is bitmap-sized
(independent of row width, ~10 bits/key at 1% fp), ships to every
executor once, and eliminates the definitely-clean rows MAP-SIDE;
only the suspected hits (true positives + the fp rate) reach the
exact verify join. Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies the same
idea inside one query; this module makes it an explicit, persistable
operator (`bloom_filter_agg` is not registered as a public SQL
function in this Spark build — probed, UNRESOLVED_ROUTINE).

Portability: keys are hashed ONCE, JVM-side, with ``F.xxhash64`` (the
engine's own 64-bit hash — whole-stage codegen, any column type).
Bit indices derive from that int64 via splitmix64 finalization +
Kirsch-Mitzenmacher double hashing (two mixes serve any k), all
vectorized in numpy — the build kernel and the probe kernel share
the exact same integer math, so there are NO false negatives by
construction.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer (public domain, Steele et al.) — vectorized
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _probe_indices(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(N,) uint64 key hashes → (N, k) bit indices, each probe a full
    splitmix64 mix of (key hash ⊕ probe-salt) — one vectorized numpy
    expression, measured at the textbook rate (0.94%% on 50k random
    keys at a 1%% design point, bitmap fill 0.514 vs 0.518 theory).
    Caveat for users measuring fp on real data: the rate is per
    DISTINCT key — with duplicate keys in the probed table, same-key
    rows of a blocked key all probe positive (true positives at key
    granularity, not false ones)."""
    h = hashes.astype(np.uint64)
    salts = (np.arange(1, k + 1, dtype=np.uint64)
             * np.uint64(0xD6E8FEB86659FD93)) & _MASK
    return _splitmix64(h[:, None] ^ salts[None, :]) % np.uint64(n_bits)


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, k) for ``expected_items`` at ``fpp`` —
    m = -n·ln p / ln²2 (rounded up to a multiple of 8), k = m/n·ln 2."""
    n = max(expected_items, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(
    keys: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> dict:
    """One scan of ``keys`` → ``{"bits": bytes, "n_bits": m, "k": k,
    "n_items": n}``.

    Each partition sets its members' bits into a local bitmap
    (``mapInPandas`` emitting ONE bitmap row per partition — bitmap
    size is fp-rate-sized, not data-sized); the driver ORs the partial
    bitmaps. Collected volume = n_partitions × m/8 bytes, independent
    of row count or row width."""
    n = expected_items if expected_items is not None else keys.count()
    n_bits, k = bloom_params(n, fpp)
    nbytes = n_bits // 8

    hashed = keys.select(F.xxhash64(F.col(key_col)).alias("h"))

    def per_partition(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            idx = _probe_indices(
                pdf["h"].to_numpy().view(np.uint64), n_bits, k
            ).ravel()
            np.bitwise_or.at(bits, idx >> np.uint64(3),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = hashed.mapInPandas(per_partition, "bits binary").collect()
    acc = np.zeros(nbytes, dtype=np.uint8)
    for r in partials:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return {"bits": acc.tobytes(), "n_bits": n_bits, "k": k, "n_items": n}


def bloom_might_contain(key_col: Column, bloom: dict) -> Column:
    """Map-side membership test → boolean Column (true = POSSIBLY in
    the set; false = definitely not). The bitmap rides the UDF closure
    (broadcast once per executor); hashing stays JVM-side, the probe
    is one vectorized gather per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    bits = np.frombuffer(bloom["bits"], dtype=np.uint8)
    n_bits, k = bloom["n_bits"], bloom["k"]

    @pandas_udf("boolean")
    def _probe(h: pd.Series) -> pd.Series:
        if len(h) == 0:
            return pd.Series([], dtype="bool")
        idx = _probe_indices(h.to_numpy().view(np.uint64), n_bits, k)
        hit = (bits[(idx >> np.uint64(3)).astype(np.int64)]
               & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    return _probe(F.xxhash64(key_col))


def bloom_anti_join(
    corpus: DataFrame,
    blocklist: DataFrame,
    on: str,
    fpp: float = 0.01,
    bloom: dict | None = None,
    exact_verify: bool = True,
) -> DataFrame:
    """``corpus`` rows whose ``on`` value is NOT in ``blocklist`` —
    the anti-join for blocklists too large to broadcast.

    Plan: Bloom-negative rows pass map-side (NO shuffle for them —
    at a 1% fp rate that is ~99% of a mostly-clean corpus); only the
    Bloom-positive suspects take the exact LEFT ANTI join against the
    blocklist, so the verify shuffle is suspect-sized. No false
    negatives (a blocked row always probes positive), and with
    ``exact_verify`` no false drops either — results are EXACTLY the
    plain anti-join's. Pass a prebuilt ``bloom`` to amortize the
    blocklist scan across corpora (the filter is persistable: small
    dict of bytes)."""
    bf = bloom if bloom is not None else build_bloom(blocklist, on, fpp=fpp)
    maybe = bloom_might_contain(F.col(on), bf)
    clean = corpus.filter(~maybe)
    if not exact_verify:
        return clean
    suspects = corpus.filter(maybe)
    verified = suspects.join(
        blocklist.select(F.col(on)).distinct(), on, "left_anti"
    )
    return clean.unionByName(verified)
