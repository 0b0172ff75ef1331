"""Full-registry session-config sweep: run EVERY ``queries()`` entry
twice — pinned session, then hostile session confs (ANSI on, shifted
timezone, odd shuffle partitions) — and report value-hash divergence.
The window-sized version is a pytest (tests/test_window_session_sweep
.py); this tool covers the remaining ~250 locally-gated queries once
per round, because session-TZ sensitivity on the NTZ parquet
timestamps was the round-3/4 driver-only hash-red mechanism and only a
sweep can prove its absence.

Usage: python tools/session_sweep.py [query ...]   (default: all)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOSTILE = [("spark.sql.ansi.enabled", "true"),
           ("spark.sql.session.timeZone", "America/New_York"),
           ("spark.sql.shuffle.partitions", "7")]

EXEMPT = {"diag_env"}   # reflects session config by design


def _norm(v):
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def _vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entry
    from eventrelationextractor_spark.spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    only = set(sys.argv[1:])
    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = [n for n in qs
             if n not in EXEMPT and (not only or n in only)]
    base = {}
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            base[n] = _vhash(df.columns, [tuple(r) for r in df.collect()])
        except Exception as e:  # noqa: BLE001
            print(f"ERROR(base) {n}: {str(e)[:120]}", flush=True)
    for k, v in HOSTILE:
        spark.conf.set(k, v)
    bad = 0
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            h = _vhash(df.columns, [tuple(r) for r in df.collect()])
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERROR(hostile) {n}: {str(e)[:120]}", flush=True)
            continue
        if h != base.get(n):
            bad += 1
            print(f"DIVERGED {n}", flush=True)
        else:
            print(f"ok   {n}", flush=True)
    print("diverged:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
