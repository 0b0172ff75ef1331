"""S10: lexicon scan. Loads the signal/verb dictionaries shipped with the
reference (vendored verbatim under resources/lexicons; formats per
/root/reference/src/model/feature/TemporalSignalList.java:23-47 and
CausalSignalList.java:25-50). These are a few KB: at the Spark layer they are
broadcast once per job."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

_RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "resources", "lexicons")


def _read_pairs(path: str) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
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


_CACHE: Lexicons | None = None


def load_lexicons(res_dir: str | None = None) -> Lexicons:
    global _CACHE
    if _CACHE is not None and res_dir is None:
        return _CACHE
    d = res_dir or _RES
    lx = Lexicons()
    lx.temporal_event = _read_pairs(os.path.join(d, "temporal_signal_event.list"))
    lx.temporal_timex = _read_pairs(os.path.join(d, "temporal_signal_timex.list"))
    with open(os.path.join(d, "causal_signal.list"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            cols = line.split("|||")
            lx.causal_pattern[cols[0].strip()] = cols[1].strip()
            lx.causal_cluster[cols[0].strip()] = cols[2].strip()
    lx.causal_verb = _read_pairs(os.path.join(d, "causal_verb.list"))
    if res_dir is None:
        _CACHE = lx
    return lx
