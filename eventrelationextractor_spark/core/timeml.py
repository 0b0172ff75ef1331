"""S5/S8: TimeML gold parsing and TimeML serialization.

Parsing follows /root/reference/src/parser/TimeMLParser.java:76-255:
MAKEINSTANCE maps eiid -> eid (last node wins via reverse iteration),
TLINK/CLINK endpoints resolve eiid -> eid and timeID 't..' -> 'tmx..'
(the reference's blanket ``replace("t","tmx")``), and the ``deduced``
attribute is kept. Used for gold-relation evaluation only - the production
input format is TXP-annotated pages.

The writer is the triple sink in TimeML shape (S8,
TempEval3TaskABC.writeTimeMLFile 252-416): MAKEINSTANCE per event +
<TLINK lid=..> nodes per predicted relation
(TemporalRelation.toTimeMLNode, TemporalRelation.java:60-88). The
reference rebuilds the full annotated <TEXT> from the source TML document;
our sink emits the relation layer (instances + links), which is the part
derivable from the extraction output alone.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import quoteattr

from .docmodel import DocState


def parse_timeml_gold(xml_text: str) -> dict:
    """-> {'instances': {eiid: eid}, 'tlinks': [(src, tgt, rel, deduced)],
          'clinks': [(src, tgt)], 'events': {eid: class},
          'timexes': {tmxid: (type, value)}, 'dct_value': str}"""
    root = ET.fromstring(xml_text)

    instances: dict = {}
    for node in reversed(root.findall(".//MAKEINSTANCE")):
        instances[node.get("eiid")] = node.get("eventID")

    def resolve(raw: str | None, is_time: bool) -> str | None:
        if raw is None:
            return None
        if is_time:
            return raw.replace("t", "tmx")  # TimeMLParser.java:169,177
        return instances.get(raw, raw)

    tlinks = []
    for node in reversed(root.findall(".//TLINK")):
        if node.get("eventInstanceID") is not None:
            src = resolve(node.get("eventInstanceID"), False)
        else:
            src = resolve(node.get("timeID"), True)
        if node.get("relatedToEventInstance") is not None:
            tgt = resolve(node.get("relatedToEventInstance"), False)
        else:
            tgt = resolve(node.get("relatedToTime"), True)
        tlinks.append((src, tgt, node.get("relType"),
                       node.get("deduced") == "true"))

    clinks = []
    for node in reversed(root.findall(".//CLINK")):
        src = resolve(node.get("eventInstanceID"), False)
        tgt = resolve(node.get("relatedToEventInstance"), False)
        clinks.append((src, tgt))

    events = {n.get("eid"): n.get("class") for n in root.findall(".//EVENT")}
    timexes = {}
    dct_value = ""
    for n in root.findall(".//TIMEX3"):
        tid = (n.get("tid") or "").replace("t", "tmx")
        timexes[tid] = (n.get("type"), n.get("value"))
        if n.get("functionInDocument") == "CREATION_TIME":
            dct_value = n.get("value") or ""
    return {"instances": instances, "tlinks": tlinks, "clinks": clinks,
            "events": events, "timexes": timexes, "dct_value": dct_value}


def write_timeml(doc: DocState, triples, docid: str = "DOC") -> str:
    """Serialize predictions as a TimeML relation layer."""
    lines = ['<?xml version="1.0" ?>', "<TimeML>",
             f"<DOCID>{docid}</DOCID>"]
    for mid, m in doc.entities.items():
        if m.kind == "EVENT":
            lines.append(
                f'<MAKEINSTANCE eventID={quoteattr(mid)} '
                f'eiid={quoteattr("i" + mid)} tense={quoteattr(m.tense)} '
                f'aspect={quoteattr(m.aspect)} polarity={quoteattr(m.pol)}/>')
    lid = 1
    for t in triples:
        src, tgt, rel = t.source, t.target, t.rel
        src_is_tmx = (doc.entities.get(src) is not None
                      and doc.entities[src].is_timex)
        tgt_is_tmx = (doc.entities.get(tgt) is not None
                      and doc.entities[tgt].is_timex)
        # TimeML uses 't<n>' time ids; internal ids are 'tmx<n>'
        s_attr = "timeID" if src_is_tmx else "eventInstanceID"
        t_attr = "relatedToTime" if tgt_is_tmx else "relatedToEventInstance"
        s_val = src.replace("tmx", "t") if src_is_tmx else src
        t_val = tgt.replace("tmx", "t") if tgt_is_tmx else tgt
        lines.append(
            f'<TLINK lid={quoteattr("l" + str(lid))} {s_attr}={quoteattr(s_val)} '
            f'{t_attr}={quoteattr(t_val)} relType={quoteattr(rel)}/>')
        lid += 1
    lines.append("</TimeML>")
    return "\n".join(lines)
