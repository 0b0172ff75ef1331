"""G1: per-document temporal-consistency filtering (point algebra).

A python-3 port of the *semantics* of the reference's Jython timegraph
post-filter (/root/reference/src/model/rule/TimeGraph.java:14-78 driving
tools/TempEval3-evaluation-tool/evaluation-relations/relation_to_timegraph.py):
build a point graph from weight-sorted relations, keep each relation that
is consistent with the ones accepted so far, report the violated rest.
DURING/DURING_INV are treated as SIMULTANEOUS, matching the TE3 scorer
(temporal_evaluation.py:62-75).

Interval -> point constraints (s_x < e_x implied for every interval):
BEFORE  e1 < s2      IBEFORE  e1 = s2     INCLUDES  s1 < s2, e2 < e1
BEGINS  s1 = s2, e1 < e2                  ENDS      s2 < s1, e1 = e2
SIMULTANEOUS/IDENTITY  s1 = s2, e1 = e2   (+ inverses)

Documents are small (<= hundreds of mentions), so the filter runs inside
the per-document UDF - no distributed graph is needed (SURVEY.md §2.8).
"""

from __future__ import annotations

# rel -> list of point constraints; each is (kind, p1, p2) with points
# ('s'|'e', which_entity) and kind '<' or '='
_CONSTRAINTS = {
    "BEFORE": (("<", ("e", 0), ("s", 1)),),
    "AFTER": (("<", ("e", 1), ("s", 0)),),
    "IBEFORE": (("=", ("e", 0), ("s", 1)),),
    "IAFTER": (("=", ("e", 1), ("s", 0)),),
    "INCLUDES": (("<", ("s", 0), ("s", 1)), ("<", ("e", 1), ("e", 0))),
    "IS_INCLUDED": (("<", ("s", 1), ("s", 0)), ("<", ("e", 0), ("e", 1))),
    "BEGINS": (("=", ("s", 0), ("s", 1)), ("<", ("e", 0), ("e", 1))),
    "BEGUN_BY": (("=", ("s", 0), ("s", 1)), ("<", ("e", 1), ("e", 0))),
    "ENDS": (("<", ("s", 1), ("s", 0)), ("=", ("e", 0), ("e", 1))),
    "ENDED_BY": (("<", ("s", 0), ("s", 1)), ("=", ("e", 0), ("e", 1))),
    "SIMULTANEOUS": (("=", ("s", 0), ("s", 1)), ("=", ("e", 0), ("e", 1))),
    "IDENTITY": (("=", ("s", 0), ("s", 1)), ("=", ("e", 0), ("e", 1))),
    "DURING": (("=", ("s", 0), ("s", 1)), ("=", ("e", 0), ("e", 1))),
    "DURING_INV": (("=", ("s", 0), ("s", 1)), ("=", ("e", 0), ("e", 1))),
}


class PointGraph:
    """Incremental strict-partial-order with equality merging."""

    def __init__(self):
        self._parent: dict = {}
        self._lt: dict = {}   # root -> set of roots strictly after it

    def _find(self, x):
        p = self._parent.setdefault(x, x)
        if p == x:
            return x
        r = self._find(p)
        self._parent[x] = r
        return r

    def _reachable(self, a, b) -> bool:
        """Is there a strict path a -> b (a < b derivable)?"""
        if a == b:
            return False
        seen = {a}
        stack = [a]
        while stack:
            cur = stack.pop()
            for nxt in self._lt.get(cur, ()):
                nxt = self._find(nxt)
                if nxt == b:
                    return True
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        return False

    def can_add_lt(self, a, b) -> bool:
        ra, rb = self._find(a), self._find(b)
        return ra != rb and not self._reachable(rb, ra)

    def can_add_eq(self, a, b) -> bool:
        ra, rb = self._find(a), self._find(b)
        return ra == rb or (not self._reachable(ra, rb)
                            and not self._reachable(rb, ra))

    def add_lt(self, a, b):
        self._lt.setdefault(self._find(a), set()).add(self._find(b))

    def add_eq(self, a, b):
        ra, rb = self._find(a), self._find(b)
        if ra == rb:
            return
        self._parent[rb] = ra
        self._lt.setdefault(ra, set()).update(self._lt.pop(rb, ()))


def filter_consistent(relations) -> tuple:
    """relations: iterable of (src, tgt, rel) in priority order. Returns
    (kept, violated) lists; each relation is accepted only if compatible
    with everything accepted before it (first-wins, like the reference's
    weight-sorted insertion)."""
    g = PointGraph()

    def ensure_interval(x):
        if ("s", x) not in g._parent:
            g._parent[("s", x)] = ("s", x)
            g._parent[("e", x)] = ("e", x)
            g.add_lt(("s", x), ("e", x))

    kept, violated = [], []
    for item in relations:
        src, tgt, rel = item[0], item[1], item[2]
        cons = _CONSTRAINTS.get(rel)
        if cons is None:          # unknown/causal labels pass through
            kept.append(item)
            continue
        ensure_interval(src)
        ensure_interval(tgt)
        ents = (src, tgt)
        # snapshot so a partially-applied relation can be rolled back
        parent_snap = dict(g._parent)
        lt_snap = {k: set(v) for k, v in g._lt.items()}
        ok = True
        for kind, (p1, i1), (p2, i2) in cons:
            a, b = (p1, ents[i1]), (p2, ents[i2])
            if kind == "<":
                if not g.can_add_lt(a, b):
                    ok = False
                    break
                g.add_lt(a, b)
            else:
                if not g.can_add_eq(a, b):
                    ok = False
                    break
                g.add_eq(a, b)
        if not ok:
            g._parent, g._lt = parent_snap, lt_snap
        (kept if ok else violated).append(item)
    return kept, violated
