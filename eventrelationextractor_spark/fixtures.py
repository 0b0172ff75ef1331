"""Vendored reference fixture documents + their golden predictions.

The TXP documents are the reference's own bundled fixtures
(/root/reference/data/example_TXP/*) and the inline samples from
TempRelPro.main / CauseRelPro.main; the prediction TSVs are the output of
the compiled reference on them (tests/golden/README.md)."""

from __future__ import annotations

from datetime import datetime, timezone

from .respath import read_resource_text

TEMPORAL_FIXTURES = ("sample_temporal", "bbc_20130322_721", "wsj_1014")
CAUSAL_FIXTURES = ("sample_causal", "wsj_1014")

_DOC_FILE = {
    "sample_temporal": "sample_temporal.txp",
    "sample_causal": "sample_causal.txp",
    "bbc_20130322_721": "bbc_20130322_721.tml.txp",
    "wsj_1014": "wsj_1014.tml.txp",
}


def fixture_url(name: str) -> str:
    return "https://fixtures.example.org/" + name


def fixture_text(name: str) -> str:
    return read_resource_text("resources", "fixtures",
                              _DOC_FILE[name]).rstrip("\n")


def fixture_pages(names) -> list:
    from .datagen import wrap_html
    return [{
        "url": fixture_url(n),
        "warc_ts": datetime(2024, 1, 1, tzinfo=timezone.utc),
        "html": wrap_html(fixture_text(n), n),
        "text": fixture_text(n),
        "lang": "en",
    } for n in names]


def golden_predictions(name: str, kind: str) -> list:
    """[(url, subj, pred, obj)] from the reference's golden run."""
    if kind == "causal":
        fname = ("sample_causal_predictions.tsv" if name == "sample_causal"
                 else name + "_causal_predictions.tsv")
    else:
        fname = (name + "_predictions.tsv" if name == "sample_temporal"
                 else name + "_temporal_predictions.tsv")
    url = fixture_url(name)
    out = []
    for line in read_resource_text("resources", "fixtures", fname).split("\n"):
        if line.strip():
            s, t, r = line.rstrip("\n").split("\t")
            out.append((url, s, r, t))
    return out
