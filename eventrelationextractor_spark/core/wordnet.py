"""X10: real WordNet Lin similarity engine (optional, flag-gated).

The full CATENA computes ws4j Lin relatedness over WordNet
(EventEventFeatureVector.java:46-57: ``new Lin(new NictWordNet())``,
``calcRelatednessOfWords(lemma1, lemma2)``) and discretizes it to
{0, 0.25, 0.75, 1} (lines 60-66). The golden-parity build stubs ws4j, so
``features.wn_similarity_bucket`` defaults to the constant 0.0 bucket;
this module supplies the real computation for deployments that have a
WordNet database on disk.

Implements the public WNDB file format (wndb(5WN): ``index.<pos>`` /
``data.<pos>``) and the WordNet::Similarity information-content file
format (lines ``<offset><pos> <count> [ROOT]``), then

    lin(c1, c2) = 2 * IC(lcs) / (IC(c1) + IC(c2))
    IC(c)       = -log(count(c) / count(root))

maximized over all synset pairs of the two lemmas (the ws4j
``calcRelatednessOfWords`` convention; 0.0 when either lemma is unknown
or the pair shares no subsumer). The sandbox ships no WordNet database,
so tests exercise the engine on a tiny self-authored WNDB-format fixture
taxonomy (tests/fixtures/mini_wn/) - the parser, closure, IC math and
bucket mapping are fully real; only the dictionary is synthetic.

Enable per process with ``features.set_wordnet(WordNetDB.load(path))``
or the ``ERE_SPARK_WNDB`` environment variable (checked lazily, so Spark
executors pick it up via ``spark.executorEnv``). Default off: golden
parity against the stubbed build requires the constant bucket.
"""

from __future__ import annotations

import math
import os

_POS_FILES = (("n", "noun"), ("v", "verb"))

HYPERNYM_SYMBOLS = ("@", "@i")   # hypernym, instance hypernym


class WordNetDB:
    """Minimal WNDB reader: lemma -> synsets, synset -> hypernyms + IC."""

    def __init__(self, senses, hypernyms, counts, roots):
        self._senses = senses        # (lemma, pos) -> [offset, ...]
        self._hypernyms = hypernyms  # (offset, pos) -> [(offset, pos), ...]
        self._counts = counts        # (offset, pos) -> cumulative count
        self._roots = roots          # pos -> root count

    @classmethod
    def load(cls, dictdir: str, ic_path: str | None = None) -> "WordNetDB":
        senses: dict = {}
        hypernyms: dict = {}
        for pos, fname in _POS_FILES:
            ipath = os.path.join(dictdir, f"index.{fname}")
            dpath = os.path.join(dictdir, f"data.{fname}")
            if not os.path.exists(ipath):
                continue
            with open(ipath, encoding="utf-8") as f:
                for line in f:
                    if line.startswith(" ") or not line.strip():
                        continue
                    parts = line.split()
                    lemma = parts[0]
                    synset_cnt = int(parts[2])
                    p_cnt = int(parts[3])
                    # offsets are the last synset_cnt fields (wndb(5WN))
                    offs = [int(x) for x in parts[4 + p_cnt + 2:]]
                    assert len(offs) == synset_cnt, line
                    senses[(lemma, pos)] = offs
            with open(dpath, encoding="utf-8") as f:
                for line in f:
                    if line.startswith(" ") or not line.strip():
                        continue
                    head = line.split("|")[0].split()
                    off = int(head[0])
                    w_cnt = int(head[3], 16)
                    i = 4 + 2 * w_cnt
                    ptr_cnt = int(head[i])
                    hyps = []
                    for p in range(ptr_cnt):
                        sym, toff, tpos, _st = head[i + 1 + 4 * p:
                                                    i + 5 + 4 * p]
                        if sym in HYPERNYM_SYMBOLS:
                            hyps.append((int(toff), tpos))
                    hypernyms[(off, pos)] = hyps
        counts, roots = cls._load_ic(ic_path) if ic_path else ({}, {})
        return cls(senses, hypernyms, counts, roots)

    @staticmethod
    def _load_ic(path):
        counts: dict = {}
        roots: dict = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2 or parts[0] == "wnver":
                    continue
                key, pos = int(parts[0][:-1]), parts[0][-1]
                counts[(key, pos)] = float(parts[1])
                if len(parts) > 2 and parts[2] == "ROOT":
                    roots[pos] = roots.get(pos, 0.0) + float(parts[1])
        return counts, roots

    # ---------------------------------------------------------------- IC

    def ic(self, synset) -> float:
        off_pos = synset
        cnt = self._counts.get(off_pos, 0.0)
        root = self._roots.get(off_pos[1], 0.0)
        if cnt <= 0.0 or root <= 0.0 or cnt >= root:
            # unknown / root-level concepts carry no information
            return 0.0
        return -math.log(cnt / root)

    def _ancestors(self, synset) -> dict:
        """synset -> {ancestor (incl. self)}"""
        seen = set()
        stack = [synset]
        while stack:
            s = stack.pop()
            if s in seen:
                continue
            seen.add(s)
            stack.extend(self._hypernyms.get(s, ()))
        return seen

    def lin(self, lemma1: str, lemma2: str) -> float:
        """Max Lin similarity over all same-POS synset pairs (ws4j
        calcRelatednessOfWords convention); 0.0 when unknown."""
        best = 0.0
        for pos, _ in _POS_FILES:
            s1 = self._senses.get((lemma1, pos), ())
            s2 = self._senses.get((lemma2, pos), ())
            for a in s1:
                anc_a = self._ancestors((a, pos))
                ic_a = self.ic((a, pos))
                for b in s2:
                    ic_b = self.ic((b, pos))
                    common = anc_a & self._ancestors((b, pos))
                    if not common:
                        continue
                    ic_lcs = max(self.ic(c) for c in common)
                    denom = ic_a + ic_b
                    if denom > 0.0:
                        best = max(best, 2.0 * ic_lcs / denom)
                    elif ic_lcs == 0.0 and a == b:
                        best = max(best, 1.0)
        return best


def discretize(sim: float) -> float:
    """EventEventFeatureVector.getDiscreteDoubleWordSimilarity:60-66
    (note the reference maps (0, 0.5] to 0.25 and (0.5, 1] to 0.75)."""
    if sim > 1.0:
        return 1.0
    if sim > 0.5:
        return 0.75
    if sim > 0.0:
        return 0.25
    return 0.0
