"""Manual hot-key de-skew: salted equi-join.

AQE's skew-join split (`tests/test_plans.py::test_aqe_splits_skewed_join`)
is the first line of defense at 100 TB, but it only fires for sort-merge
joins inside one stage boundary and splits at partition granularity. A
SALTED join handles the cases AQE can't: a single key so hot that even a
split partition is one key's rows (web-crawl boilerplate domains,
null-like sentinel keys), or engines/stages where AQE is off. The
pattern: scatter the BIG side's rows across ``salts`` sub-keys with a
deterministic hash, replicate the SMALL side once per sub-key, and join
on (key, salt) — the hot key's rows now land on ``salts`` tasks instead
of one.

Correctness constraints (asserted):

- The salt on the big side must be DETERMINISTIC per row (here:
  xxhash64 of the whole row). A nondeterministic salt (rand(),
  monotonically_increasing_id) double-counts or drops rows when a
  shuffle stage retries — every exchange input must be replayable.
- Only ``inner`` and ``left`` joins are supported: the replicated side
  is the RIGHT side, whose rows may legitimately appear ``salts`` times
  pre-join, so right-outer/full semantics would fabricate null-extended
  duplicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with hot-key salting.

    ``left`` is the big/skewed side (scattered); ``right`` is the
    replicated side — its pre-join size grows ×``salts``, so keep it the
    smaller relation (the same constraint as a broadcast, relaxed by a
    factor of cluster memory / salts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        raise ValueError("salts must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)

    # Deterministic per-row scatter: hash EVERY left column, not just the
    # join key (hashing only the key would send the hot key to one salt
    # and defeat the whole point). Identical duplicate rows co-locate,
    # which skews only as far as true row multiplicity.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts))
    salted_left = left.withColumn("__salt", salt)

    # long-typed to match pmod(xxhash64)'s type — no cast in the join key.
    replicated_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long"))),
    )
    joined = salted_left.join(replicated_right, [*keys, "__salt"], how)
    return joined.drop("__salt")
