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


def java_hashmap_order(keys_in_insertion_order) -> list:
    """Iteration order of a default HashMap<String,?> built by inserting
    ``keys_in_insertion_order`` (unique keys) one by one."""
    keys = list(keys_in_insertion_order)
    cap = hashmap_capacity(len(keys))
    buckets: list[list] = [[] for _ in range(cap)]
    for k in keys:
        buckets[_spread(java_string_hash(k)) & (cap - 1)].append(k)
    return [k for b in buckets for k in b]
