"""S10: lexicon scan. Loads the signal/verb dictionaries shipped with the
reference (vendored verbatim under resources/lexicons; formats per
/root/reference/src/model/feature/TemporalSignalList.java:23-47 and
CausalSignalList.java:25-50). These are a few KB: at the Spark layer they are
broadcast once per job."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..respath import read_resource_text


def _read_lines(res_dir, name):
    if res_dir is not None:
        with open(os.path.join(res_dir, name), encoding="utf-8") as f:
            return f.read().split("\n")
    return read_resource_text("resources", "lexicons", name).split("\n")


def _read_pairs(lines) -> dict:
    out = {}
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        cols = line.split("|||")
        out[cols[0].strip()] = cols[1].strip()
    return out


@dataclass
class Lexicons:
    temporal_event: dict = field(default_factory=dict)   # variant -> cluster
    temporal_timex: dict = field(default_factory=dict)
    causal_pattern: dict = field(default_factory=dict)   # id -> regex
    causal_cluster: dict = field(default_factory=dict)   # id -> cluster
    causal_verb: dict = field(default_factory=dict)      # lemma -> cluster
    # lazily-built caches (compiled once per process, shared by all docs)
    _compiled: dict = field(default_factory=dict, repr=False)

    def compiled_causal_patterns(self) -> dict:
        """id -> compiled ' pattern ' regex (marker search, X7)."""
        import re
        if "pat" not in self._compiled:
            self._compiled["pat"] = {
                k: re.compile(" " + p + " ")
                for k, p in self.causal_pattern.items()}
        return self._compiled["pat"]

    def gate_signal_regex(self):
        """Single alternation for the sentence gate (CauseRelPro.java:61-77;
        the keys are the numeric ids - reference bug kept)."""
        import re
        if "gate_sig" not in self._compiled:
            alt = "|".join(re.escape(k) for k in self.causal_cluster)
            self._compiled["gate_sig"] = re.compile(" (?:" + alt + ") ")
        return self._compiled["gate_sig"]

    def gate_verb_regex(self):
        import re
        if "gate_verb" not in self._compiled:
            alt = "|".join(re.escape(k).replace("\\ ", " ")
                           for k in self.causal_verb)
            self._compiled["gate_verb"] = re.compile(" (?:" + alt + ") ")
        return self._compiled["gate_verb"]

    def sorted_signal_keys(self, which: str) -> list:
        """Reverse-sorted signal variants (A7), computed once."""
        if which not in self._compiled:
            src = {"event": self.temporal_event,
                   "timex": self.temporal_timex}[which]
            self._compiled[which] = sorted(src, reverse=True)
        return self._compiled[which]


_CACHE: Lexicons | None = None


def load_lexicons(res_dir: str | None = None) -> Lexicons:
    global _CACHE
    if _CACHE is not None and res_dir is None:
        return _CACHE
    lx = Lexicons()
    lx.temporal_event = _read_pairs(_read_lines(res_dir, "temporal_signal_event.list"))
    lx.temporal_timex = _read_pairs(_read_lines(res_dir, "temporal_signal_timex.list"))
    for line in _read_lines(res_dir, "causal_signal.list"):
        line = line.rstrip("\n")
        if not line:
            continue
        cols = line.split("|||")
        lx.causal_pattern[cols[0].strip()] = cols[1].strip()
        lx.causal_cluster[cols[0].strip()] = cols[2].strip()
    lx.causal_verb = _read_pairs(_read_lines(res_dir, "causal_verb.list"))
    if res_dir is None:
        _CACHE = lx
    return lx
