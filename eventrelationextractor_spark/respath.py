"""Zip-safe package-resource access.

``spark-submit --py-files erex.zip`` ships the package as a zip archive;
``__file__``-relative ``open()`` breaks there, so all vendored data
(lexicons, liblinear models, fixture docs) is read through
importlib.resources, which handles both filesystem and zipimport layouts.
"""

from __future__ import annotations

from importlib.resources import files


def read_resource_text(*parts: str) -> str:
    return (files("eventrelationextractor_spark")
            .joinpath("/".join(parts)).read_text("utf-8"))
