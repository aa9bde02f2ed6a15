"""Deterministic pseudo-random hyperplane lattice for LSH.

Both engines (Spark and the DuckDB oracle) need the SAME hyperplanes,
and neither engine's native hash is portable to the other
(Spark ``hash`` = murmur3, DuckDB ``hash`` = its own). So the planes
are *precomputed here* from md5 — pure Python, no Spark import — and
embedded as literal arrays on both sides:

  weight(seed, plane p, dim d) = int(md5(f"{seed}:{p}:{d}")[:8], 16)
                                 % 2001 - 1000        # in [-1000, 1000]

md5 of a short string is uniform enough for sign-random projections
(the reference property needed by random-hyperplane LSH: P[bit differs]
= angle/pi), and the integer lattice avoids any float-parsing drift
between engines. Mirrors the role of the reference's deterministic
blank-node generator (lib/MicrodataRdfParser.ts:152) — determinism as a
first-class property so results are reproducible across retries and
engines.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

LSH_SEED = "lsh-v1"


@lru_cache(maxsize=32)
def plane_weights(
    dim: int, n_planes: int, seed: str = LSH_SEED
) -> tuple[tuple[int, ...], ...]:
    """n_planes x dim integer weight lattice in [-1000, 1000]."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) % 2001 - 1000)
        planes.append(tuple(row))
    return tuple(planes)


@lru_cache(maxsize=32)
def linear_weights(
    n_buckets: int, seed: str = "linear-lr-v1"
) -> tuple[int, ...]:
    """Per-bucket NON-NEGATIVE integer weights in [0, 2000] for the
    hashed linear classifier (operators/classify.py) — md5-derived so
    both engines embed the identical weight table as plan-time
    literals. Non-negative by construction: the score stays positive,
    so the cross-engine integer division never hits the negative
    floor-vs-truncate divergence."""
    return tuple(
        int(hashlib.md5(f"{seed}:{b}".encode()).hexdigest()[:8], 16) % 2001
        for b in range(n_buckets)
    )
