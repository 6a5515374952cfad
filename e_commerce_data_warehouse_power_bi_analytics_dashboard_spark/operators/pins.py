"""Session-scoped registry for invariant-frame ``persist()`` pins.

Iterative operators (PageRank, the basket pair mining) pin frames that
are re-read once per round within a single action. The pins are useful
only while that invocation's plan executes — but ``persist()`` marks
live until explicitly released, so repeated catalog calls in a
long-lived session would accumulate cached RDDs until eviction pressure
(the round-5 advisory). The registry bounds that: each pinned
invocation calls :func:`fresh_pins` first, which releases every pin the
PREVIOUS invocation registered, so at most one invocation's pins are
ever live. Releasing is safe at any time — ``persist`` marks lineage,
it does not truncate, so an already-returned (lazy) frame simply
recomputes if its pin was evicted before its action ran.

bench.py / correctness_local.py additionally clear the whole cache
between reps; this registry is the in-session guard for everyone else.

Ownership contract (r12 advisory): OPERATORS own the registry. Library
operators (``minhash_lsh_near_dups``, ``substring_spans``,
``triangle_census``, ``fixed_point_pagerank``, ...) call
:func:`fresh_pins` on entry, which releases EVERY pin registered so
far — including any a calling plan registered itself. Plans must
therefore never ``pin()`` a frame and then call a pinned operator while
that frame's action is still pending; pass the frame INTO the operator
(e.g. the ``shingles=`` parameter) or materialize it first. Releasing
is always correctness-safe (persist marks lineage, it does not
truncate), so a violated contract recomputes — it never corrupts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() ``df`` and register it for release by the NEXT
    pinned invocation (or an explicit :func:`release_pins`)."""
    df.persist()
    _PINNED.append(df)
    return df


def fresh_pins() -> None:
    """Start a new pinned invocation: release all previous pins."""
    release_pins()


def release_pins() -> None:
    """Unpersist (non-blocking) every registered pin."""
    while _PINNED:
        _PINNED.pop().unpersist(blocking=False)
