"""Explicit hot-key skew handling for joins — the manual tool for when
AQE's skew-join split (enabled engine-wide in ``session.py``) can't act:
AQE only splits sort-merge join partitions AFTER a shuffle materializes;
a replicated salted join avoids concentrating a hot key on one reducer
in the first place.

``salted_join``: equi-join where the LEFT side carries skewed keys (a
mega-url, a flash-crowd time bucket). Left rows get a deterministic
content-hash salt in ``[0, salt)``; the right side is replicated
``salt`` times (one copy per salt value) so every (key, salt) pair
co-locates. Cost: right side shuffled ``salt``× — use when
``|right| * salt`` ≪ the hot key's row count, and keep the right side
the SMALL side. Equivalent to the plain join row-for-row (property
test), never a cartesian node (plan test).

Reference analog: none (single-process); this is the distributed-only
concern the reference never faces — its bitset probe is O(1) per row on
one machine (``growing_bitset.hpp:48-65``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``on`` (left keys may be hot).

    ``how`` ∈ {inner, left}. Output columns = the plain join's columns.
    The salt is a deterministic CONTENT hash of the full left row (every
    non-map column — hashing only the join keys would send the whole hot
    key to one bucket and defeat the point), so re-runs reproduce the
    same physical distribution. Rows that are bytewise identical share a
    bucket; that residual skew is bounded by the duplicate multiplicity,
    which exact dedup upstream removes.
    """
    if how not in ("inner", "left"):
        # right/full would surface unmatched RIGHT rows once per salt
        # replica — silently wrong multiplicity
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 2:
        return left.join(right, keys, how)
    hashable = [c for c, t in left.dtypes if not t.startswith("map<")]
    lsalted = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.lit("skew-salt"), *[F.col(c) for c in hashable]),
            F.lit(salt),
        ).cast("int"),
    )
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lsalted.join(rrep, [*keys, "__salt"], how).drop("__salt")
