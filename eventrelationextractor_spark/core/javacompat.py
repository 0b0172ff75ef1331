"""Behavioral-parity helpers replicating JVM container semantics.

The reference engine (paramitamirza/EventRelationExtractor) iterates
``java.util.HashMap`` key sets in several tie-breaking hot spots:

* dependency-path DFS picks the *first* path found while iterating a token's
  dependent map (``src/model/feature/PairFeatureVector.java:615-637``),
* the timex-timex rule loop iterates ``doc.getEntities().keySet().toArray()``
  (``src/relpro/TempRelPro.java:64``),
* the causal signal search iterates the signal map in HashMap order
  (``src/model/feature/PairFeatureVector.java:1406``).

Java's HashMap order for String keys is deterministic (String.hashCode is
specified), so the reference is reproducible run-to-run; to hit the P/R>=0.95
parity bar we replicate that order for small maps instead of inventing our
own tie-break. Java 8+ preserves within-bucket insertion order on resize, so
computing buckets at the *final* capacity with insertion-ordered chaining
reproduces the iteration order exactly (tree-ified buckets with >=8 collisions
are not emulated; they do not occur for the key shapes used here).
"""

from __future__ import annotations


def java_string_hash(s: str) -> int:
    """Replicates java.lang.String#hashCode (32-bit overflow semantics)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h


def _spread(h: int) -> int:
    """java.util.HashMap#hash: h ^ (h >>> 16) on the 32-bit value."""
    return (h ^ (h >> 16)) & 0xFFFFFFFF


def hashmap_capacity(n: int) -> int:
    """Capacity a default-constructed HashMap ends up with after n puts."""
    cap = 16
    while n > (cap * 3) // 4:
        cap <<= 1
    return cap


_ORDER_CACHE: dict = {}
_HASH_CACHE: dict = {}


def java_hashmap_order(keys_in_insertion_order) -> list:
    """Iteration order of a default HashMap<String,?> built by inserting
    ``keys_in_insertion_order`` (unique keys) one by one. Results are
    memoized: dependency maps repeat the same key tuples thousands of
    times per document during the path DFS."""
    keys = tuple(keys_in_insertion_order)
    cached = _ORDER_CACHE.get(keys)
    if cached is not None:
        return cached
    cap = hashmap_capacity(len(keys))
    buckets: list[list] = [[] for _ in range(cap)]
    for k in keys:
        h = _HASH_CACHE.get(k)
        if h is None:
            h = _spread(java_string_hash(k))
            _HASH_CACHE[k] = h
        buckets[h & (cap - 1)].append(k)
    out = [k for b in buckets for k in b]
    if len(_ORDER_CACHE) < 1_000_000:
        _ORDER_CACHE[keys] = out
    return out
