"""tool_compat engine: the TempEval-3 evaluation tool's chain/pseudotime
timegraph, ported verdict-for-verdict (including its known DERIVATION
INCOMPLETENESS) so `core.awareness.temporal_awareness(tool_compat=True)`
reproduces the reference tool bit-for-bit on every golden case - the one
adjudicated divergence (wsj_1014's (e64, tmx394, IS_INCLUDED), which the
exact point-algebra closure derives as redundant but the tool keeps)
included.

Semantics source: the reference's own scorer,
tools/TempEval3-evaluation-tool/evaluation-relations/
relation_to_timegraph.py (cited per method below). The tool organizes
time points into CHAINS (totally ordered, integer pseudotimes) plus a
METAGRAPH of cross-chain links anchored at connection points;
reachability is pseudo-compare within a chain plus a cross-chain DFS
that only leaves a chain at connection points AT OR AFTER the source
pseudotime and never re-enters a visited chain (:1506). Because cross
links recorded later don't back-fill earlier connection points, some
transitively derivable relations return UNKNOWN - that incompleteness
is load-bearing for parity and deliberately preserved, as are the
tool's quirks: insertion-order-dependent chain layout, string-membership
checks with substring semantics, node ALIASING on equality-style
inserts (x's point becomes y's Node object), the BEFORE-extension's
pseudo computed from an unset value (:678 -> base-relative -1000), and
Python-2 floor division in midpoint pseudotimes.

The exact-closure engine (core.timegraph / core.awareness.ReducedGraph)
remains the default everywhere; this module exists only behind
``tool_compat=True``.
"""

from __future__ import annotations

NIL = "-1"
_BASE = 100000          # relation_to_timegraph.py:70
_DIFF = 1000            # :72

_EQ = ("IDENTITY", "SIMULTANEOUS")

_REVERSE = {            # reverse_relation, :207-232
    "BEFORE": "AFTER", "AFTER": "BEFORE", "IBEFORE": "IAFTER",
    "IAFTER": "IBEFORE", "DURING": "DURING_DURING_INV",
    "BEGINS": "BEGUN_BY", "BEGUN_BY": "BEGINS", "ENDS": "ENDED_BY",
    "ENDED_BY": "ENDS", "INCLUDES": "IS_INCLUDED",
    "IS_INCLUDED": "INCLUDES", "IDENTITY": "SIMULTANEOUS",
    "SIMULTANEOUS": "SIMULTANEOUS",
}


def reverse_relation(rel: str) -> str:
    return _REVERSE.get(rel.upper(), rel.upper())


class _Pt:
    """One time point (Node, :154): chain id + integer pseudotime, plus
    the parent/child/sibling neighbor STRINGS the tool's branch
    conditions test with (padded-)substring membership."""
    __slots__ = ("id", "chain", "pseudo", "parent", "child", "sibling")

    def __init__(self, pid: str):
        self.id = pid
        self.chain = 0
        self.pseudo = 0
        self.parent = ""
        self.child = ""
        self.sibling = ""


class _Meta:
    """Per-chain metagraph record (Chain, :166): cp = space-joined
    connection-point names, cross_chain[cp] = space-joined points
    reachable from cp (x AFTER cp edges)."""
    __slots__ = ("cp", "cross_chain")

    def __init__(self, cp: str):
        self.cp = cp
        self.cross_chain: dict = {}


def _has_word(x: str, s: str) -> bool:
    """search_x_in_y (:288): padded-substring membership."""
    return (" " + x + " ") in (" " + s + " ")


class ToolTimegraph:
    """Insertion + query engine mirroring add_relation_in_timegraph
    (:381), interval_rel_X_Y (:1734) and the chain traversal (:1506)."""

    def __init__(self):
        self.nodes: dict = {}
        self.meta: dict = {}
        self.next_chain = 0

    # ------------------------------------------------------- metagraph

    def _link_after(self, nx: _Pt, x: str, ny: _Pt, y: str) -> None:
        """Record point x AFTER connection point y on y's chain
        (add_X_after_Y_metagraph, :256). Membership tests are UNpadded
        substring searches, exactly as the tool's re.search(y, cp)."""
        m = self.meta.get(ny.chain)
        if m is None:
            m = _Meta(y)
            m.cross_chain[y] = x
            self.meta[ny.chain] = m
            return
        if y not in m.cp:
            m.cp += " " + y
        if y in m.cross_chain:
            if x not in m.cross_chain[y]:
                m.cross_chain[y] += " " + x
        else:
            m.cross_chain[y] = x

    # ---------------------------------------------------- point inserts

    def _pt_after(self, x: str, y: str) -> _Pt:
        """add_point_x_AFTER_y (:291)."""
        ny = self.nodes[y]
        nx = _Pt(x)
        if ny.child == NIL:
            nx.chain = ny.chain
            ny.child = x
            nx.parent = y
            nx.child = NIL
            nx.pseudo = ny.pseudo + _DIFF
        else:
            nx.chain = self.next_chain
            self.next_chain += 1
            nx.pseudo = ny.pseudo + _DIFF
            nx.parent = NIL
            nx.child = NIL
            self._link_after(nx, x, ny, y)
        return nx

    def _pt_before(self, x: str, y: str) -> _Pt:
        """add_point_x_BEFORE_y (:312)."""
        ny = self.nodes[y]
        nx = _Pt(x)
        if ny.parent == NIL:
            nx.chain = ny.chain
            ny.parent = x
            nx.parent = NIL
            nx.child = y
            nx.pseudo = ny.pseudo - _DIFF
        else:
            nx.chain = self.next_chain
            self.next_chain += 1
            nx.pseudo = ny.pseudo - _DIFF
            nx.parent = NIL
            nx.child = NIL
            self._link_after(ny, y, nx, x)
        return nx

    def _pt_during(self, x: str, y: str, z: str) -> _Pt:
        """add_point_x_DURING_y_z (:340): y < x < z. Midpoint pseudo is
        Python-2 floor division; some branches leave parent/child ''."""
        ny, nz = self.nodes[y], self.nodes[z]
        nx = _Pt(x)
        if ny.chain == nz.chain and _has_word(z, ny.child) \
                and _has_word(y, nz.parent):
            nx.chain = ny.chain
            ny.child = x
            nz.parent = x
            nx.parent = y
            nx.child = z
            nx.pseudo = ny.pseudo + (nz.pseudo - ny.pseudo) // 2
        elif ny.child == NIL:
            nx.chain = ny.chain
            ny.child = x
            nx.parent = y
            nx.pseudo = ny.pseudo + _DIFF
            nx.child = NIL
            self._link_after(nz, z, nx, x)
        elif nz.parent == NIL:
            nz.parent = x
            nx.child = z
            nx.chain = nz.chain
            nx.pseudo = nz.pseudo - _DIFF
            self._link_after(nx, x, ny, y)
        else:
            nx.chain = self.next_chain
            self.next_chain += 1
            nx.pseudo = ny.pseudo + (nz.pseudo - ny.pseudo) // 2
            self._link_after(nx, x, ny, y)
            self._link_after(nz, z, nx, x)
        return nx

    # ------------------------------------------------------- traversal

    def _traverse(self, nx: _Pt, ny: _Pt, hist: str) -> bool:
        """traverse_timegraph_identify_rel (:1506): is nx <= ny? Chains
        are only left at connection points with pseudo >= nx.pseudo and
        never re-entered (chain_history) - the incompleteness source."""
        if nx.chain == ny.chain:
            return nx.pseudo <= ny.pseudo
        hist = hist + " " + str(nx.chain)
        m = self.meta.get(nx.chain)
        if m is not None:
            for cp in m.cp.split(" "):
                ncp = self.nodes[cp]
                if int(nx.pseudo) <= int(ncp.pseudo):
                    for each in m.cross_chain[cp].split(" "):
                        ec = self.nodes[each]
                        if not _has_word(str(ec.chain), hist):
                            if self._traverse(ec, ny, hist):
                                return True
        return False

    def point_rel(self, x: str, y: str) -> str:
        """point_rel_x_y (:1561) -> '<' | '>' | '=' | 'UNKNOWN'."""
        nx, ny = self.nodes[x], self.nodes[y]
        if nx.chain == ny.chain:                      # find_point_rel
            if nx.pseudo > ny.pseudo:
                return ">"
            if nx.pseudo < ny.pseudo:
                return "<"
            return "="
        x_to_y = self._traverse(nx, ny, "")
        y_to_x = self._traverse(ny, nx, "")
        if x_to_y and y_to_x:
            return "="
        if x_to_y:
            return "<"
        if y_to_x:
            return ">"
        return "UNKNOWN"

    # ------------------------------------------- interval-level queries

    def interval_rel(self, X: str, Y: str, rel: str, option: str) -> str:
        """interval_rel_X_Y (:1734) -> 'true' | 'semi-true' | 'UNKNOWN'
        | 'false'. With option='check_n_merge', UNKNOWN point relations
        trigger add_relation_for_existing_entities (metagraph merge) and
        return 'semi-true'. The tool's per-relation condition nesting -
        including the BEGINS branch whose impossible `== '=' and ==
        'UNKNOWN'` guard (:1834) makes it unverifiable - is preserved
        via each relation's (first-point, ordered-checks) table below."""
        x1, x2 = X + "_s", X + "_e"
        y1, y2 = Y + "_s", Y + "_e"
        if not (x1 in self.nodes and x2 in self.nodes
                and y1 in self.nodes and y2 in self.nodes):
            return "false" if option == "check_n_merge" else "UNKNOWN"
        merge = option == "check_n_merge"

        def semi():
            if merge:
                self._merge_existing(x1, x2, y1, y2, rel)
                return "semi-true"
            return None

        pr = self.point_rel
        if rel == "BEFORE":
            r = pr(x2, y1)
            if r == "<":
                return "true"
            if r == "UNKNOWN":
                return semi() or "UNKNOWN"
        elif rel == "AFTER":
            r = pr(y2, x1)
            if r == "<":
                return "true"
            if r == "UNKNOWN":
                return semi() or "UNKNOWN"
        elif rel == "IBEFORE":
            r = pr(x2, y1)
            if r == "=":
                return "true"
            if r == "UNKNOWN":
                return semi() or "UNKNOWN"
        elif rel == "IAFTER":
            r = pr(y2, x1)
            if r == "=":
                return "true"
            if r == "UNKNOWN":
                return semi() or "UNKNOWN"
        elif rel == "DURING":                         # Allen overlap, :1810
            if pr(x1, y1) == "<":
                if pr(x2, y2) == "<":
                    if pr(y1, x2) == "<":
                        return "true"
                    s = semi()
                    if s:
                        return s
        elif rel == "BEGINS":
            pass      # :1834: '= and UNKNOWN' can't co-hold -> falls out
        elif rel == "BEGUN_BY":
            a = pr(x1, y1)
            if a in ("=", "UNKNOWN"):
                b = pr(y2, x2)
                if b in ("<", "UNKNOWN"):
                    if b == "<" and a == "=":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        elif rel == "ENDS":
            a = pr(x2, y2)
            if a in ("=", "UNKNOWN"):
                b = pr(y1, x1)
                if b in ("<", "UNKNOWN"):
                    if a == "=" and b == "<":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        elif rel == "ENDED_BY":
            a = pr(x2, y2)
            if a in ("=", "UNKNOWN"):
                b = pr(x1, y1)
                if b in ("<", "UNKNOWN"):
                    if a == "=" and b == "<":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        elif rel == "INCLUDES":
            a = pr(x1, y1)
            if a in ("<", "UNKNOWN"):
                b = pr(y2, x2)
                if b in ("<", "UNKNOWN"):
                    if a == "<" and b == "<":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        elif rel == "IS_INCLUDED":
            a = pr(y1, x1)
            if a in ("<", "UNKNOWN"):
                b = pr(x2, y2)
                if b in ("<", "UNKNOWN"):
                    if a == "<" and b == "<":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        elif rel in _EQ:
            a = pr(x1, y1)
            if a in ("=", "UNKNOWN"):
                b = pr(x2, y2)
                if b in ("=", "UNKNOWN"):
                    if a == "=" and b == "=":
                        return "true"
                    s = semi()
                    if s:
                        return s
                elif b == "UNKNOWN" and a == "UNKNOWN":
                    return "UNKNOWN"
        return "false"

    # --------------------------- both entities exist: metagraph merging

    def _merge_existing(self, x1, x2, y1, y2, rel) -> None:
        """add_relation_for_existing_entities_in_timegraph (:1581):
        per-relation cross-chain links + neighbor-string updates.
        Table rows: (after_pt, conn_pt, update-child-of-conn,
        update-parent-of-after) pairs, then symmetric sibling marks."""
        n = self.nodes

        def after(a, b):          # point a AFTER point b
            self._link_after(n[a], a, n[b], b)
            n[b].child += " " + a
            n[a].parent += " " + b

        def twins(a, b):          # mutual '=' marks
            after(a, b)
            after(b, a)
            n[a].sibling += " " + b
            n[b].sibling += " " + a

        if rel == "BEFORE":
            after(y1, x2)
        elif rel == "AFTER":
            after(x1, y2)
        elif rel == "IBEFORE":
            twins(x2, y1)
        elif rel == "IAFTER":
            twins(x1, y2)
        elif rel == "DURING":
            after(y1, x1)
            after(y2, x2)
            after(x2, y1)
        elif rel == "DURING_INV":
            after(x1, y1)
            after(x2, y2)
            after(y2, x1)
        elif rel == "BEGINS":
            twins(x1, y1)
            after(y2, x2)
        elif rel == "BEGUN_BY":
            twins(x1, y1)
            after(x2, y2)
        elif rel == "ENDS":
            after(x1, y1)
            twins(x2, y2)
        elif rel == "ENDED_BY":
            after(y1, x1)
            twins(x2, y2)
        elif rel == "INCLUDES":
            after(y1, x1)
            after(x2, y2)
        elif rel == "IS_INCLUDED":
            after(x1, y1)
            after(y2, x2)
        elif rel in _EQ:
            twins(x1, y1)
            twins(x2, y2)

    # ------------------------------------------------------- insertion

    # Fresh-pair chain layouts (:416-656): per relation, the 4 points in
    # insertion order as (name-slot, pseudo-slot, parent, child,
    # sibling); pseudo-slot k means BASE + k*DIFF. name-slots: 0=x_s,
    # 1=x_e, 2=y_s, 3=y_e; neighbor strings are templates over the same
    # slots ('0 2' -> '<x_s> <y_s>').
    _FRESH = {
        "BEFORE": [(0, 0, NIL, "1", ""), (1, 1, "0", "2", ""),
                   (2, 2, "1", "3", ""), (3, 3, "2", NIL, "")],
        "AFTER": [(2, 0, NIL, "3", ""), (3, 1, "2", "0", ""),
                  (0, 2, "3", "1", ""), (1, 3, "0", NIL, "")],
        "IBEFORE": [(0, 0, NIL, "1 2", ""), (1, 1, "0", "3", "2"),
                    (2, 1, "0", "3", "1"), (3, 2, "2 1", NIL, "")],
        "IAFTER": [(2, 0, NIL, "3 0", ""), (3, 1, "2", "1", "0"),
                   (0, 1, "2", "1", "3"), (1, 2, "0 3", NIL, "")],
        "DURING": [(0, 0, NIL, "2", ""), (2, 1, "0", "1", ""),
                   (1, 2, "2", "3", ""), (3, 3, "1", NIL, "")],
        "BEGINS": [(0, 0, NIL, "1", "2"), (2, 0, NIL, "1", "0"),
                   (1, 1, "0 2", "3", ""), (3, 2, "1", NIL, "")],
        "BEGUN_BY": [(0, 0, NIL, "3", "2"), (2, 0, NIL, "3", "0"),
                     (3, 1, "0 2", "1", ""), (1, 2, "3", NIL, "")],
        "ENDS": [(2, 0, NIL, "0", ""), (0, 1, "2", "1 3", ""),
                 (1, 2, "0", NIL, "3"), (3, 2, "0", NIL, "1")],
        "ENDED_BY": [(0, 0, NIL, "2", ""), (2, 1, "0", "1 3", ""),
                     (1, 2, "2", NIL, "3"), (3, 2, "2", NIL, "1")],
        "INCLUDES": [(0, 0, NIL, "2", ""), (2, 1, "0", "3", ""),
                     (3, 2, "2", "1", ""), (1, 3, "3", NIL, "")],
        "IS_INCLUDED": [(2, 0, NIL, "0", ""), (0, 1, "2", "1", ""),
                        (1, 2, "0", "3", ""), (3, 3, "1", NIL, "")],
        "SIMULTANEOUS": [(0, 0, NIL, "1 3", "2"), (2, 0, NIL, "1 3", "0"),
                         (1, 1, "0 2", NIL, "3"), (3, 1, "0 2", NIL, "1")],
    }
    _FRESH["IDENTITY"] = _FRESH["SIMULTANEOUS"]

    def _insert_fresh(self, pts: tuple, rel: str) -> bool:
        layout = self._FRESH.get(rel)
        if layout is None:
            return False
        chain = self.next_chain
        self.next_chain += 1

        def fill(tpl):
            if tpl == NIL or tpl == "":
                return tpl
            return " ".join(pts[int(t)] for t in tpl.split(" "))

        built = {}
        for slot, k, par, chi, sib in layout:
            node = _Pt(pts[slot])
            node.chain = chain
            node.pseudo = _BASE + k * _DIFF
            node.parent = fill(par)
            node.child = fill(chi)
            node.sibling = fill(sib)
            built[slot] = node
        # store in the tool's fixed x1,x2,y1,y2 order (:653-656) - the
        # overwrite winner matters when X == Y makes keys collide
        for slot in (0, 1, 2, 3):
            self.nodes[pts[slot]] = built[slot]
        return True

    def _extend(self, x1, x2, y1, y2, rel) -> bool:
        """x-pair absent, y-pair present (:660-1348). Returns handled.
        Branch structure and quirks (aliasing, the unset-pseudo BEFORE
        bug, neighbor-string update ORDER) follow the tool verbatim."""
        n = self.nodes
        ny1, ny2 = n[y1], n[y2]
        nx1, nx2 = _Pt(x1), _Pt(x2)

        if rel == "BEFORE":                                     # :662
            if ny1.parent == NIL:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                nx1.pseudo = nx2.pseudo - _DIFF   # nx2 still 0 (:678)
                nx1.parent = NIL
                nx1.child = x2
                nx2.pseudo = ny1.pseudo - _DIFF
                nx2.parent = x1
                nx2.child = y1
                ny1.parent = x2
            else:
                nx1.chain = self.next_chain
                nx2.chain = self.next_chain
                self.next_chain += 1
                nx1.pseudo = nx2.pseudo - _DIFF   # same quirk (:692)
                nx1.parent = NIL
                nx1.child = x2
                nx2.pseudo = ny1.pseudo - _DIFF
                nx2.parent = x1
                nx2.child = y1
                ny1.parent += " " + x2
                self._link_after(ny1, y1, nx2, x2)
        elif rel == "AFTER":                                    # :708
            if ny2.child == NIL:
                nx1.chain = ny2.chain
                nx1.pseudo = ny2.pseudo + _DIFF
                nx1.parent = y2
                nx1.child = x2
                nx2.chain = ny2.chain
                nx2.pseudo = nx1.pseudo + _DIFF
                nx2.parent = x1
                nx2.child = NIL
                ny2.child = x1
            else:
                nx1.chain = self.next_chain
                nx1.pseudo = ny2.pseudo + _DIFF
                nx1.parent = y2
                nx1.child = x2
                nx2.chain = self.next_chain
                nx2.pseudo = nx1.pseudo + _DIFF
                nx2.parent = x1
                nx2.child = NIL
                ny2.child += " " + x1
                self.next_chain += 1
                self._link_after(nx1, x1, ny2, y2)
        elif rel == "IBEFORE":                                  # :750
            if ny1.parent == NIL:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                ny1.parent = x1
                ny1.sibling += " " + x2
                ny2.parent += " " + x2
                nx2.pseudo = ny1.pseudo
                nx2.parent = x1
                nx2.child = ny1.child
                nx2.sibling = ny1.sibling + " " + y1
                nx1.pseudo = nx2.pseudo - _DIFF
                nx1.child = x2 + " " + y1
                nx1.parent = NIL
            else:                                               # :788
                nx1.chain = self.next_chain
                nx2.chain = ny1.chain
                ny1.parent += " " + x1
                ny1.sibling += " " + x2
                ny2.parent += " " + x2
                nx2.pseudo = ny1.pseudo
                nx2.parent = ny1.parent
                nx2.child = ny1.child
                nx2.sibling = ny1.sibling + " " + y1
                nx1.pseudo = nx2.pseudo - _DIFF
                nx1.child = x2 + " " + y1
                nx1.parent = NIL
                self.next_chain += 1
                self._link_after(nx2, x2, nx1, x1)
        elif rel == "IAFTER":                                   # :814
            if ny2.child == NIL:
                ny1.child += " " + x1
                ny2.sibling += " " + x1
                ny2.child = x2
                nx1.chain = ny2.chain
                nx2.chain = ny2.chain
                nx1.pseudo = ny2.pseudo
                nx1.parent = ny2.parent
                nx1.child = x2
                nx1.sibling = ny2.sibling + " " + y2
                nx2.pseudo = nx1.pseudo + _DIFF
                nx2.parent = x1 + " " + y2
                nx2.child = NIL
            else:                                               # :851
                ny1.child += " " + x1
                nx1 = ny2                     # ALIAS (:855)
                nx1.sibling += " " + y2
                ny2.child += " " + x2
                ny2.sibling += " " + x1
                nx2.chain = self.next_chain
                nx2.pseudo = ny2.pseudo + _DIFF
                nx2.parent = x1 + " " + y2
                nx2.child = NIL
                self.next_chain += 1
                self._link_after(nx2, x2, nx1, x1)
        elif rel == "BEGINS":                                   # :975
            if _has_word(y2, ny1.child) and _has_word(y1, ny2.parent) \
                    and ny1.chain == ny2.chain:
                nx1 = ny1                     # ALIAS (:994)
                nx1.sibling = ny1.sibling + " " + y1
                nx2.chain = ny1.chain
                nx2.parent = x1 + " " + y1
                nx2.child = y2
                ny1.sibling += " " + x1
                ny1.child = ny1.child.replace(y2, x2)   # re.sub (:1000)
                nx2.pseudo = ny1.pseudo + (ny2.pseudo - ny1.pseudo) // 2
                ny2.parent = ny2.parent.replace(y1, x2)
            else:                                               # :1018
                nx2 = self._pt_during(x2, y1, y2)
                ny1.sibling += " " + x1
                nx1 = ny1                     # ALIAS
                nx1.sibling += " " + y1
        elif rel == "BEGUN_BY":                                 # :1024
            if ny2.child == NIL and ny1.chain == ny2.chain:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                nx2.pseudo = ny2.pseudo + _DIFF
                ny1.sibling += " " + x1
                nx1 = ny1                     # ALIAS (:1048)
                nx1.sibling += " " + y1
                ny2.parent += " " + x1
                nx2.parent = y2
                ny2.child = x2
                nx2.child = NIL
            else:                                               # :1069
                nx2 = self._pt_after(x2, y2)
                nx1 = ny1                     # ALIAS
        elif rel == "ENDS":                                     # :1075
            if _has_word(y2, ny1.child) and _has_word(y1, ny2.parent) \
                    and ny1.chain == ny2.chain:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                nx1.pseudo = ny1.pseudo + (ny2.pseudo - ny1.pseudo) // 2
                nx2.pseudo = ny2.pseudo
                ny1.child = x1                # plain assign (:1097)
                nx1.parent = y1
                nx1.child = x2
                nx2.parent = x1
                nx2.sibling = ny2.sibling + " " + y2
                ny2.sibling += " " + x2
                nx2.child = ny2.child
                ny2.parent = x1
            else:                                               # :1116
                nx2 = ny2                     # ALIAS
                nx1 = self._pt_during(x1, y1, y2)
        elif rel == "ENDED_BY":                                 # :1120
            if ny1.parent == NIL and ny1.chain == ny2.chain:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                nx1.pseudo = ny1.pseudo - _DIFF
                nx2.pseudo = ny2.pseudo
                nx1.parent = NIL
                nx1.child = y1
                nx2.parent = ny2.parent
                nx2.child = ny2.child
                nx2.sibling = ny2.sibling + " " + y2
                ny1.parent = x1
                ny1.child += " " + x2
                ny2.sibling += " " + x2
            else:                                               # :1165
                nx2 = ny2                     # ALIAS
                nx1 = self._pt_before(x1, y1)
        elif rel == "INCLUDES":                                 # :1171
            if ny1.parent == NIL and ny2.child == NIL \
                    and ny1.chain == ny2.chain:
                nx1.chain = ny1.chain
                nx2.chain = ny2.chain
                ny1.parent = x1
                nx1.pseudo = ny1.pseudo - _DIFF
                nx1.parent = NIL
                nx1.child = y1
                ny2.child = x2
                nx2.parent = y2
                nx2.child = NIL
                nx2.pseudo = ny2.pseudo + _DIFF
            elif ny1.parent != NIL or ny2.child != NIL:         # :1203
                nx1.chain = self.next_chain
                nx2.chain = self.next_chain
                self.next_chain += 1
                nx1.pseudo = ny1.pseudo - _DIFF
                nx2.pseudo = ny2.pseudo + _DIFF
                nx1.parent = NIL
                nx2.child = x2                # then overwritten (:1210-12)
                nx2.parent = x1
                nx2.child = NIL
                self._link_after(ny1, y1, nx1, x1)
                self._link_after(nx2, x2, ny2, y2)
            else:                                               # :1218
                nx1 = self._pt_before(x1, y1)
                nx2 = self._pt_after(x2, y2)
        elif rel == "IS_INCLUDED":                              # :1226
            if _has_word(y2, ny1.child) and _has_word(y1, ny2.parent) \
                    and ny1.chain == ny2.chain:
                nx1.chain = ny1.chain
                nx2.chain = ny1.chain
                nx1.pseudo = ny1.pseudo + (ny2.pseudo - ny1.pseudo) // 3
                nx2.pseudo = ny1.pseudo \
                    + (ny2.pseudo - ny1.pseudo) * 2 // 3
                nx1.parent = ny1.sibling + " " + y1
                nx2.child = ny2.sibling + " " + y2
                ny1.child = x1
                nx1.child = x2
                nx2.parent = x1
            else:                                               # :1282
                nx1.chain = self.next_chain
                nx2.chain = self.next_chain
                self.next_chain += 1
                nx1.pseudo = ny1.pseudo + (ny2.pseudo - ny1.pseudo) // 3
                nx2.pseudo = ny1.pseudo \
                    + (ny2.pseudo - ny1.pseudo) * 2 // 3
                nx1.parent = NIL
                nx1.child = x2
                nx2.parent = x1
                nx2.child = NIL
                self._link_after(nx1, x1, ny1, y1)
                self._link_after(ny2, y2, nx2, x2)
        elif rel in _EQ:                                        # :1300
            if ny1.chain == ny2.chain:
                nx1 = ny1                     # ALIAS both (:1318)
                nx2 = ny2
                nx1.sibling += " " + y1
                nx2.sibling += " " + y2
                ny1.sibling += " " + x1
                ny2.sibling += " " + x2
            else:                                               # :1339
                nx1 = ny1
                nx2 = ny2
        else:
            return False

        self.nodes[x1] = nx1
        self.nodes[x2] = nx2
        self.nodes[y1] = ny1
        self.nodes[y2] = ny2
        return True

    def add_relation(self, X: str, Y: str, rel: str) -> str:
        """add_relation_in_timegraph (:381) -> classification:
        'kept' | 'violated' | 'redundant'. NB the X==Y early violation
        does NOT stop processing - the tool still inserts the (self-)
        pair, key collisions and all."""
        rel = rel.upper()
        x1, x2 = X + "_s", X + "_e"
        y1, y2 = Y + "_s", Y + "_e"
        verdict = "kept"
        handled = False
        if X == Y and rel not in _EQ:                           # :398
            verdict = "violated"
            handled = True

        n = self.nodes
        if y1 not in n and y2 not in n and x1 in n and x2 in n:  # :406
            rel = reverse_relation(rel)
            x1, x2 = Y + "_s", Y + "_e"
            y1, y2 = X + "_s", X + "_e"

        if not (x1 in n or x2 in n or y1 in n or y2 in n):       # :416
            handled = self._insert_fresh((x1, x2, y1, y2), rel) or handled
        elif x1 not in n and x2 not in n and y1 in n and y2 in n:  # :660
            handled = self._extend(x1, x2, y1, y2, rel) or handled

        if not handled:                                         # :1363
            # both pairs exist (or an unhandled relation/partial state);
            # NB interval_rel is queried with the ORIGINAL X/Y order but
            # the possibly-REVERSED rel when the :406 swap fired - the
            # tool never re-swaps, quirk preserved
            match = self.interval_rel(X, Y, rel, "check_n_merge")
            if match == "false":
                return "violated"
            if match == "true":
                return "redundant"
            return "kept"                     # 'semi-true': newly added
        return verdict
