"""Deterministic synthetic web-page corpus (FIXTURES.md §1-2).

Each page row is `(url, warc_ts, html, text, lang)` per BASELINE.json
input_hint; `text` carries a TXP-format annotated document in the 16-column
service layout (TempRelPro.java:659-662). Every annotation is a pure
function of ``doc_id`` - no RNG - so an ANSI-SQL oracle can predict the
pipeline's exact triple output (see __spark_entry__.oracle_sql):

* DCT        = 2010-01-01 + (d % 100) days                       (tmx0)
* tmx1..tmx3 = 2000-01-01 + ((d*37 + k*101) % 365) days, except
  tmx3 repeats tmx1's value when d % 5 == 0 (SIMULTANEOUS pairs)
* tmx4       = month prefix of tmx1 (INCLUDES / IS_INCLUDED pairs)
* e1..e3     anchor to tmx0 with (tense, aspect) cycling
  (FUTURE,NONE) / (PRESENT,PROGRESSIVE) / (PAST,PERFECTIVE) by (d+k) % 3
  -> E-DCT rule labels AFTER / INCLUDES / BEFORE
* e1:tmx1    with preposition cycling by d % 6 -> ET rule labels
* e4:e5      with Reichenbach tense pairs by d % 2 -> EE rule labels
* sentence 3 holds a causal construction "<e6> <verb>s ... to <e7>" with
  verb cycling cause/prevent/make/see by d % 4 (see -> no causal verb ->
  gate closed -> no causal triple)

All lemmas were checked against resource/causal_verb.list and the temporal
signal lists so no *unintended* sieve fires; the full temporal output per
document is therefore rule-only and closed-form.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone

BASE_URL = "https://example.org/doc/"

_EDCT_COMBOS = (("FUTURE", "NONE"), ("PRESENT", "PROGRESSIVE"),
                ("PAST", "PERFECTIVE"))
EDCT_LABELS = ("AFTER", "INCLUDES", "BEFORE")

_ET_PREPS = ("on", "at", "after", "before", "from", "until")
ET_LABELS = ("IS_INCLUDED", "IS_INCLUDED", "AFTER", "BEFORE", "BEGUN_BY",
             "IS_INCLUDED")  # 'until' needs polarity 'POS'; TXP carries 'pos'

_EE_COMBOS = ((("PAST", "NONE"), ("PAST", "PERFECTIVE")),
              (("PAST", "NONE"), ("FUTURE", "NONE")))
EE_LABELS = ("AFTER", "BEFORE")

_CAUSAL_VERBS = ("cause", "prevent", "make", "see")
CAUSAL_LABELS = ("CLINK", "CLINK", "CLINK", None)

# classifier-bound EE tense/aspect combos (none triggers a rule sieve);
# the predicted label is a constant per combo because the sentence-4
# structure is identical across documents - constants verified against the
# real pipeline in tests/test_datagen.py
_EE_CLF_COMBOS = ((("PRESENT", "NONE"), ("PRESENT", "NONE")),
                  (("NONE", "NONE"), ("PAST", "NONE")),
                  (("PRESENT", "PERFECTIVE"), ("PAST", "PROGRESSIVE")))
EE_CLF_LABELS = ("BEFORE", "AFTER", "AFTER")  # measured from the pipeline


def dct_value(d: int) -> str:
    return (date(2010, 1, 1) + timedelta(days=d % 100)).isoformat()


def tmx_value(d: int, k: int) -> str:
    """k = 1..3 full dates (k=3 repeats k=1 when d%5==0); k = 4 month."""
    if k == 4:
        return tmx_value(d, 1)[:7]
    if k == 3 and d % 5 == 0:
        k = 1
    return (date(2000, 1, 1)
            + timedelta(days=(d * 37 + k * 101) % 365)).isoformat()


def _tok(text, tid, sent, pos, lemma, deps="O", tmx_id="O", tmx_type="O",
         tmx_value_="O", ev_class="O", ev_id="O", chunk="O", tap="O",
         tlink="O"):
    return "\t".join((text, tid, sent, pos, lemma, deps, tmx_id, tmx_type,
                      tmx_value_, "O", ev_class, ev_id, chunk, "O", tap,
                      tlink))


def synth_txp_lines(d: int) -> list:
    """TXP lines (16-column layout) for synthetic document ``d``."""
    dct = dct_value(d)
    v = {k: tmx_value(d, k) for k in (1, 2, 3, 4)}
    tap = ["%s+%s+pos" % _EDCT_COMBOS[(d + k) % 3] for k in (1, 2, 3)]
    prep = _ET_PREPS[d % 6]
    (t4a, t4b), (t5a, t5b) = _EE_COMBOS[d % 2]
    cverb = _CAUSAL_VERBS[d % 4]

    lines = [
        "DCT_" + dct + "\tO\tO\tO\tO\tO\ttmx0\tB-DATE\t" + dct
        + "\tO\tO\tO\tO\tO\tO\tO",
        # sentence 1: three anchored events + four timexes
        _tok("happened", "t1", "1", "VVD", "happen", "t3:TMP",
             ev_class="OCCURRENCE", ev_id="e1", chunk="B-VP", tap=tap[0],
             tlink="e1:tmx0:NONE||e1:tmx1:NONE"),
        _tok(prep, "t2", "1", "PRP", prep, chunk="B-PP"),
        _tok(v[1], "t3", "1", "NP0", v[1], tmx_id="tmx1", tmx_type="B-DATE",
             tmx_value_=v[1], chunk="B-NP"),
        _tok("and", "t4", "1", "CJC", "and"),
        _tok("occurred", "t5", "1", "VVD", "occur", ev_class="OCCURRENCE",
             ev_id="e2", chunk="B-VP", tap=tap[1], tlink="e2:tmx0:NONE"),
        _tok("near", "t6", "1", "PRP", "near", chunk="B-PP"),
        _tok(v[2], "t7", "1", "NP0", v[2], tmx_id="tmx2", tmx_type="B-DATE",
             tmx_value_=v[2], chunk="B-NP"),
        _tok("then", "t8", "1", "AV0", "then"),
        _tok("vanished", "t9", "1", "VVD", "vanish", ev_class="OCCURRENCE",
             ev_id="e3", chunk="B-VP", tap=tap[2], tlink="e3:tmx0:NONE"),
        _tok("near", "t10", "1", "PRP", "near", chunk="B-PP"),
        _tok(v[3], "t11", "1", "NP0", v[3], tmx_id="tmx3", tmx_type="B-DATE",
             tmx_value_=v[3], chunk="B-NP"),
        _tok("within", "t12", "1", "PRP", "within", chunk="B-PP"),
        _tok(v[4], "t13", "1", "NP0", v[4], tmx_id="tmx4", tmx_type="B-DATE",
             tmx_value_=v[4], chunk="B-NP"),
        _tok(".", "t14", "1", "PUN", "."),
        # sentence 2: Reichenbach event pair
        _tok("said", "t15", "2", "VVD", "say", ev_class="REPORTING",
             ev_id="e4", chunk="B-VP", tap="%s+%s+pos" % (t4a, t4b),
             tlink="e4:e5:NONE"),
        _tok("that", "t16", "2", "CJT", "that"),
        _tok("walked", "t17", "2", "VVD", "walk", ev_class="OCCURRENCE",
             ev_id="e5", chunk="B-VP", tap="%s+%s+pos" % (t5a, t5b)),
        _tok(".", "t18", "2", "PUN", "."),
        # sentence 3: causal construction e6 -[verb]-> e7
        _tok("trading", "t19", "3", "NN1", "trading",
             ev_class="OCCURRENCE", ev_id="e6", chunk="B-NP"),
        _tok(cverb + "s", "t20", "3", "NN0", cverb,
             deps="t19:SBJ||t21:OPRD", chunk="B-VP",
             tap="PRESENT+NONE+pos"),
        _tok("to", "t21", "3", "TO0", "to", deps="t22:IM", chunk="B-VP"),
        _tok("lose", "t22", "3", "VVB", "lose", ev_class="OCCURRENCE",
             ev_id="e7", chunk="I-VP", tap="INFINITIVE+NONE+pos"),
        _tok(".", "t23", "3", "PUN", "."),
    ]
    # sentence 4: classifier-bound EE pair (no rule sieve fires)
    (c8a, c8b), (c9a, c9b) = _EE_CLF_COMBOS[d % 3]
    lines += [
        _tok("met", "t24", "4", "VVD", "meet", ev_class="OCCURRENCE",
             ev_id="e8", chunk="B-VP", tap="%s+%s+pos" % (c8a, c8b),
             tlink="e8:e9:NONE"),
        _tok("others", "t25", "4", "NN2", "other", chunk="B-NP"),
        _tok("arrived", "t26", "4", "VVD", "arrive", ev_class="OCCURRENCE",
             ev_id="e9", chunk="B-VP", tap="%s+%s+pos" % (c9a, c9b)),
        # padding token: the reference's sentence-begin context reads
        # tokenArr[sentStart+4] unguarded (PairFeatureVector.java:1255) and
        # would crash on a 4-token final sentence
        _tok("quietly", "t27", "4", "AV0", "quietly", chunk="B-ADVP"),
        _tok(".", "t28", "4", "PUN", "."),
    ]
    return lines


def synth_url(d: int) -> str:
    return "%s%08d" % (BASE_URL, d)


def escape_html(text: str) -> str:
    """& first, then < and > (ops.htmltext.escape_expr is the codegen
    twin; ops.htmltext._unescape inverts)."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# Common-Crawl-style page template: ('lit', s) literal segments
# interleaved with ('key',) and ('text',) placeholders. Shared by
# wrap_html (Python) and ops.htmltext.wrap_html_expr (codegen twin) so
# the two stay byte-identical by construction.
WRAP_TEMPLATE = (
    ("lit", '<!DOCTYPE html>\n<html lang="en"><head><title>Doc '),
    ("key",),
    ("lit", "</title>\n"
            "<style>body { font-family: serif; margin: 2em; }</style>\n"
            '<script>var k = "'),
    ("key",),
    ("lit", '"; console.log(k);</script>\n'
            "</head>\n<body>\n"
            "<!-- crawl wrapper; payload inside article/pre -->\n"
            "<header><h1>Example corpus</h1>"
            '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
            "</header>\n"
            '<aside>related: <a href="/doc/other">other</a></aside>\n'
            '<main><article id="doc-'),
    ("key",),
    ("lit", '"><pre>'),
    ("text",),
    ("lit", "</pre></article></main>\n"
            "<footer>&copy; 2024 example.org &middot; "),
    ("key",),
    ("lit", "</footer>\n</body></html>\n"),
)


def wrap_html(text: str, key: str) -> bytes:
    """Deterministic Common-Crawl-style page around ``text``: head with
    title/style/script, header+nav+aside+footer boilerplate, the payload
    entity-escaped inside <article><pre> (pre because TXP text is
    tab/newline-structured and must survive byte-identically - the north
    rule's per-url invariant). ops.htmltext.html_to_text inverts this
    wrapper exactly; the boilerplate strings in WRAP_TEMPLATE are what
    its heuristics must strip."""
    out = []
    for part in WRAP_TEMPLATE:
        if part[0] == "lit":
            out.append(part[1])
        elif part[0] == "key":
            out.append(key)
        else:
            out.append(escape_html(text))
    return "".join(out).encode()


def synth_page(d: int) -> dict:
    text = "\n".join(synth_txp_lines(d))
    return {
        "url": synth_url(d),
        "warc_ts": datetime(2024, 1, 1, tzinfo=timezone.utc)
        + timedelta(seconds=d),
        "html": wrap_html(text, "%08d" % d),
        "text": text,
        "lang": "en",
    }


def synth_pages(n_docs: int) -> list:
    return [synth_page(d) for d in range(n_docs)]


def expected_temporal_triples(d: int) -> list:
    """Closed-form expected output of the temporal pipeline on doc d -
    the Python twin of the SQL oracle (used by unit tests)."""
    out = []
    vals = {"tmx0": dct_value(d)}
    for k in (1, 2, 3, 4):
        vals["tmx%d" % k] = tmx_value(d, k)
    ids = ["tmx0", "tmx1", "tmx2", "tmx3", "tmx4"]

    def label(a, b):
        va, vb = vals[a], vals[b]
        if va == vb:
            return "SIMULTANEOUS"
        if len(va) == 7 and len(vb) == 10 and vb.startswith(va):
            return "INCLUDES"
        if len(vb) == 7 and len(va) == 10 and va.startswith(vb):
            return "IS_INCLUDED"
        return "BEFORE" if va[:7] < vb[:7] or (va[:7] == vb[:7] and va < vb) \
            else "AFTER"

    inv = {"BEFORE": "AFTER", "AFTER": "BEFORE", "INCLUDES": "IS_INCLUDED",
           "IS_INCLUDED": "INCLUDES", "SIMULTANEOUS": "SIMULTANEOUS"}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            rel = label(ids[i], ids[j])
            out.append((ids[i], ids[j], rel))
            out.append((ids[j], ids[i], inv[rel]))
    for k in (1, 2, 3):
        out.append(("e%d" % k, "tmx0", EDCT_LABELS[(d + k) % 3]))
    out.append(("e1", "tmx1", ET_LABELS[d % 6]))
    out.append(("e4", "e5", EE_LABELS[d % 2]))
    out.append(("e8", "e9", EE_CLF_LABELS[d % 3]))
    return out


def expected_causal_triples(d: int) -> list:
    rel = CAUSAL_LABELS[d % 4]
    return [("e6", "e7", rel)] if rel else []
