"""X11: one-hot feature vectorization in classifier featureList order.

Vocabularies are copied from /root/reference/src/model/feature/
PairFeatureVector.java:39-88; block semantics from the
addBinaryFeatureToVector switch (2615-3373). Four fixed layouts are
produced, matching the shipped liblinear featureLists:

* DCT   (EventDctRelationClassifier.java:75-83):  pos, chunk, eventClass,
  tense, aspect, polarity, mainVerb, hasModal                -> 167 cols
* ET    (EventTimexRelationClassifier.java:83):    eventClass, tense,
  aspect, polarity                                           -> 19 cols
* EE    (EventEventRelationClassifier.java:61-86)            -> 269 cols
* CAUSAL(EventEventCausalClassifier.java:44-67) + the 14-wide tlink one-hot
  appended by CauseRelPro.java:213                           -> 372 cols

Replicated quirks:
* pos/chunk blocks use substring containment, not equality (2632-2641);
* tempSignalPos / tempSignal2Pos compare the marker position *vocabulary*
  against the marker CLUSTER (2947, 3003-3015) - faithful to the Java;
* wnSim is the discretized Lin similarity; ws4j is absent from the
  reference build we parity-test against, so it is the constant 0.0 bucket
  (EventEventFeatureVector.java:46-66).

Encoding is plain numpy against fixed vocabularies, so the Spark layer can
vectorize whole Arrow batches at once.
"""

from __future__ import annotations

import numpy as np

from . import deps, markers
from .docmodel import DocState, Mention
from .liblinear import CAUS_LABELS, TEMP_LABELS

POS = ("AJ0", "AJC", "AJS", "AT0", "AV0", "AVP", "AVQ", "CJC", "CJS", "CJT",
       "CRD", "DPS", "DT0", "DTQ", "EX0", "ITJ", "NN0", "NN1", "NN2", "NP0",
       "ORD", "PNI", "PNP", "PNQ", "PNX", "POS", "PRF", "PRP", "PUL", "PUN",
       "PUQ", "PUR", "TO0", "UNC", "VBB", "VBD", "VBG", "VBI", "VBN", "VBZ",
       "VDB", "VDD", "VDG", "VDI", "VDN", "VDZ", "VHB", "VHD", "VHG", "VHI",
       "VHN", "VHZ", "VM0", "VVB", "VVD", "VVG", "VVI", "VVN", "VVZ", "XX0",
       "ZZ0")
CHUNK = ("B-VP", "I-VP", "B-NP", "I-NP", "B-ADJP", "I-ADJP", "B-ADVP",
         "I-ADVP", "B-PP", "I-PP", "B-SBAR", "I-SBAR")
EV_CLASS = ("REPORTING", "PERCEPTION", "ASPECTUAL", "I_ACTION", "I_STATE",
            "STATE", "OCCURRENCE")
EV_TENSE = ("PAST", "PRESENT", "FUTURE", "NONE", "INFINITIVE", "PRESPART",
            "PASTPART")
EV_ASPECT = ("PROGRESSIVE", "PERFECTIVE", "PERFECTIVE_PROGRESSIVE", "NONE")
MARKER_POSITION = ("BETWEEN", "BEFORE", "AFTER", "BEGIN", "BEGIN-BETWEEN",
                   "BEGIN-BEFORE")
TEMP_SIGNAL_EVENT = ("as soon as", "as long as", "at the same time",
                     "followed by", "prior to", "still", "during", "while",
                     "when", "immediately", "after", "until", "if",
                     "eventually", "then", "finally", "afterwards",
                     "initially", "next", "once", "since", "simultaneously",
                     "formerly", "former", "meanwhile", "later", "into",
                     "follow", "earlier", "previously", "before", "as",
                     "already")
TEMP_SIGNAL_TIMEX = ("at", "by", "in", "on", "for", "from", "to", "during",
                     "between", "after", "before", "up to", "within", "until",
                     "since", "still", "recently", "formerly", "former",
                     "early", "over", "next", "later", "lately",
                     "immediately", "earlier", "ago")
CAUS_SIGNAL = ("so that", "because of", "due to", "in consequence of",
               "in response to", "in exchange for", "in response",
               "in order to", "as a result of", "as a result", "for reason",
               "is why", "therefore", "because", "since", "as", "so", "by",
               "from")
CAUS_VERB = ("CAUSE", "CAUSE-AMBIGUOUS", "ENABLE", "PREVENT",
             "PREVENT-AMBIGUOUS", "AFFECT", "LINK")
DEP_EVENT_PATH = ("COORD-CONJ", "TMP-SUB", "OPRD", "OPRD-IM", "OBJ-SUB",
                  "ADV", "OBJ", "SBJ", "ADV-SUB", "VC", "LGS-PMOD",
                  "ADV-PMOD", "LOC-PMOD", "CONJ-COORD", "SUB-TMP", "IM-OPRD",
                  "SUB-OBJ", "SUB-ADV", "PMOD-LGS", "PMOD-ADV", "PMOD-LOC")
DEP_SIGNAL_PATH = ("SBJ", "OBJ", "OPRD", "IM", "ADV", "PRP", "SUB", "PRD",
                   "TMP", "PMOD", "LGS", "DEP", "LOC", "APPO")
TLINK_TYPES = TEMP_LABELS  # the 14 TLINK types, same order


def _onehot_eq(value, vocab, out):
    out.extend(1.0 if s == value else 0.0 for s in vocab)


def _onehot_contains(value, vocab, out):
    out.extend(1.0 if s in value else 0.0 for s in vocab)


def _sign(v: int) -> float:
    return 1.0 if v > 0 else (-1.0 if v < 0 else 0.0)


def _label_value(label: str, vocab) -> float:
    if label == "END":
        label = "ENDS"
    try:
        return float(vocab.index(label) + 1)
    except ValueError:
        return 0.0


_WORDNET = None
_WORDNET_CHECKED = False


def set_wordnet(db) -> None:
    """Enable real Lin similarity (X10) with a core.wordnet.WordNetDB, or
    disable with None. Default off: the golden-parity reference build
    stubs ws4j, so parity requires the constant 0.0 bucket."""
    global _WORDNET, _WORDNET_CHECKED
    _WORDNET = db
    _WORDNET_CHECKED = True


def _wordnet():
    global _WORDNET, _WORDNET_CHECKED
    if not _WORDNET_CHECKED:
        _WORDNET_CHECKED = True
        import os
        path = os.environ.get("ERE_SPARK_WNDB")
        if path:
            from .wordnet import WordNetDB
            ic = os.environ.get("ERE_SPARK_WNIC")
            _WORDNET = WordNetDB.load(path, ic)
    return _WORDNET


def wn_similarity_bucket(lemma1: str, lemma2: str) -> float:
    """Discretized Lin similarity (EventEventFeatureVector.java:60-66).

    The reference build we parity against stubs ws4j (the jar is not
    shipped), so the similarity is 0.0 -> bucket 0.0 for every pair.
    With a WordNet database configured (``set_wordnet`` /
    ``ERE_SPARK_WNDB``+``ERE_SPARK_WNIC`` env vars, picked up lazily in
    each Spark executor) the real Lin computation runs instead - see
    core.wordnet."""
    db = _wordnet()
    if db is None:
        return 0.0
    from .wordnet import discretize
    return discretize(db.lin(lemma1, lemma2))


def et_vector(doc: DocState, ev: Mention, tmx: Mention, label: str,
              dct_layout: bool) -> list:
    """Feature row for an event-timex pair (event first). ``dct_layout``
    selects the event-DCT featureList, else the plain ET featureList."""
    v: list = []
    if dct_layout:
        _onehot_contains(deps.token_attr(doc, ev, "pos"), POS, v)
        _onehot_contains(deps.token_attr(doc, tmx, "pos"), POS, v)
        _onehot_contains(deps.token_attr(doc, ev, "chunk"), CHUNK, v)
        _onehot_contains(deps.token_attr(doc, tmx, "chunk"), CHUNK, v)
    _onehot_eq(deps.entity_attr(doc, ev, "eventClass"), EV_CLASS, v)
    _onehot_eq(deps.entity_attr(doc, ev, "tense"), EV_TENSE, v)
    _onehot_eq(deps.entity_attr(doc, ev, "aspect"), EV_ASPECT, v)
    v.append(0.0 if deps.entity_attr(doc, ev, "polarity") == "neg" else 1.0)
    if dct_layout:
        v.append(1.0 if deps.mate_main_verb(doc, ev) == "MAIN" else 0.0)
        v.append(0.0 if deps.mate_modal_verb(doc, ev.start_tok) == "O" else 1.0)
    v.append(_label_value(label, TEMP_LABELS))
    return v


def _ee_common_prefix(doc: DocState, e1: Mention, e2: Mention, v: list,
                      with_same_attrs: bool, with_has_modal: bool):
    """The shared EE block: pos..mainVerb[,hasModal] in featureList order."""
    pos1 = deps.token_attr(doc, e1, "pos")
    pos2 = deps.token_attr(doc, e2, "pos")
    _onehot_contains(pos1, POS, v)
    _onehot_contains(pos2, POS, v)
    v.append(1.0 if pos1 == pos2 else 0.0)                      # samePos
    _onehot_contains(deps.token_attr(doc, e1, "chunk"), CHUNK, v)
    _onehot_contains(deps.token_attr(doc, e2, "chunk"), CHUNK, v)
    v.append(_sign(deps.entity_distance(doc, e1, e2)))          # entDistance
    v.append(_sign(deps.sentence_distance(doc, e1, e2)))        # sentDistance
    cls1 = deps.entity_attr(doc, e1, "eventClass")
    cls2 = deps.entity_attr(doc, e2, "eventClass")
    _onehot_eq(cls1, EV_CLASS, v)
    _onehot_eq(cls2, EV_CLASS, v)
    t1 = deps.entity_attr(doc, e1, "tense")
    t2 = deps.entity_attr(doc, e2, "tense")
    _onehot_eq(t1, EV_TENSE, v)
    _onehot_eq(t2, EV_TENSE, v)
    a1 = deps.entity_attr(doc, e1, "aspect")
    a2 = deps.entity_attr(doc, e2, "aspect")
    _onehot_eq(a1, EV_ASPECT, v)
    _onehot_eq(a2, EV_ASPECT, v)
    p1 = deps.entity_attr(doc, e1, "polarity")
    p2 = deps.entity_attr(doc, e2, "polarity")
    v.append(0.0 if p1 == "neg" else 1.0)
    v.append(0.0 if p2 == "neg" else 1.0)
    if with_same_attrs:
        v.append(1.0 if cls1 == cls2 else 0.0)                  # sameEventClass
        v.append(1.0 if (t1 == t2 and a1 == a2) else 0.0)       # sameTenseAspect
        v.append(1.0 if p1 == p2 else 0.0)                      # samePolarity
    _onehot_eq(deps.ee_dependency_path(doc, e1, e2), DEP_EVENT_PATH, v)
    v.append(1.0 if deps.mate_main_verb(doc, e1) == "MAIN" else 0.0)
    v.append(1.0 if deps.mate_main_verb(doc, e2) == "MAIN" else 0.0)
    if with_has_modal:
        v.append(0.0 if deps.mate_modal_verb(doc, e1.start_tok) == "O" else 1.0)
        v.append(0.0 if deps.mate_modal_verb(doc, e2.start_tok) == "O" else 1.0)


def ee_vector(doc: DocState, e1: Mention, e2: Mention, label: str,
              lexicons) -> list:
    """Feature row for a temporal event-event pair (EE featureList)."""
    v: list = []
    _ee_common_prefix(doc, e1, e2, v, with_same_attrs=True, with_has_modal=True)
    m = markers.get_temporal_signal_per_entity(doc, e2, lexicons)
    _onehot_eq(m.cluster, TEMP_SIGNAL_EVENT, v)       # tempSignal2ClusText
    _onehot_eq(m.cluster, MARKER_POSITION, v)         # tempSignal2Pos (quirk)
    _onehot_contains(m.dep1 or "", DEP_SIGNAL_PATH, v)  # tempSignal2Dep
    v.append(wn_similarity_bucket(deps.token_attr(doc, e1, "lemma"),
                                  deps.token_attr(doc, e2, "lemma")))
    v.append(_label_value(label, TEMP_LABELS))
    return v


def causal_vector(doc: DocState, e1: Mention, e2: Mention, label: str,
                  lexicons, tlink_type: str,
                  caus_signal_marker=None) -> list:
    """Feature row for a causal event-event pair (causal liblinear
    featureList, EventEventCausalClassifier.java:70-106, + tlink one-hot +
    labelCaus; CauseRelPro.java:196-216)."""
    v: list = []
    _ee_common_prefix(doc, e1, e2, v, with_same_attrs=True,
                      with_has_modal=True)
    tm = markers.get_temporal_signal(doc, e1, e2, lexicons)
    _onehot_eq(tm.cluster, TEMP_SIGNAL_TIMEX, v)      # tempSignalClusText
    _onehot_eq(tm.cluster, TEMP_SIGNAL_EVENT, v)
    _onehot_eq(tm.cluster, MARKER_POSITION, v)        # tempSignalPos (quirk)
    if tm.cluster == "O" or tm.cluster is None:       # tempSignalDep1Dep2
        v.extend([0.0] * (2 * len(DEP_SIGNAL_PATH)))
    else:
        _onehot_contains(tm.dep1 or "", DEP_SIGNAL_PATH, v)
        _onehot_contains(tm.dep2 or "", DEP_SIGNAL_PATH, v)
    cm = caus_signal_marker
    if cm is None:
        cm = markers.get_causal_signal(doc, e1, e2, lexicons)
    if cm.cluster == "O" or cm.cluster is None:       # causSignalClusText
        v.extend([0.0] * len(CAUS_SIGNAL))
    else:
        _onehot_eq(cm.cluster, CAUS_SIGNAL, v)
    if cm.position == "O":                            # causSignalPos
        v.extend([0.0] * len(MARKER_POSITION))
    else:
        _onehot_eq(cm.position, MARKER_POSITION, v)
    if cm.cluster == "O" or cm.cluster is None:       # causSignalDep1Dep2
        v.extend([0.0] * (2 * len(DEP_SIGNAL_PATH)))
    else:
        _onehot_contains(cm.dep1 or "", DEP_SIGNAL_PATH, v)
        _onehot_contains(cm.dep2 or "", DEP_SIGNAL_PATH, v)
    v.append(wn_similarity_bucket(deps.token_attr(doc, e1, "lemma"),
                                  deps.token_attr(doc, e2, "lemma")))
    _onehot_eq(tlink_type, TLINK_TYPES, v)            # tlink one-hot
    v.append(_label_value(label, CAUS_LABELS))        # labelCaus
    return v


def to_matrix(rows: list) -> np.ndarray:
    """Stack feature rows (label column included) into a float64 matrix."""
    if not rows:
        return np.empty((0, 0), dtype=np.float64)
    return np.asarray(rows, dtype=np.float64)


def _java_double(v: float) -> str:
    """java.lang.String.valueOf(double) for the value shapes we emit
    (integral and short decimal doubles): 1.0 -> '1.0', 0.25 -> '0.25'."""
    return repr(float(v))


def to_libsvm(vec) -> str:
    """printLibSVMVectors (PairFeatureVector.java:218-230): label first
    (the raw integer label column), then 1-based idx:value for values > 0."""
    parts = [str(int(vec[-1]))]
    for i, v in enumerate(vec[:-1]):
        if v > 0:
            parts.append(f"{i + 1}:{_java_double(v)}")
    return parts[0] + " " + " ".join(parts[1:]) if len(parts) > 1 else parts[0]


def to_csv_row(vec) -> str:
    """Dense CSV export (printCSVVectors-shaped; numeric formatting is
    ours - the reference joins its raw feature strings)."""
    return ",".join(_java_double(v) for v in vec)
