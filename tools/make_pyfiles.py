#!/usr/bin/env python
"""Build the ``--py-files`` artifact the north rule's ship path uses:

    python tools/make_pyfiles.py               # -> dist/locus_spark.zip
    spark-submit --py-files dist/locus_spark.zip jobs/run.py --rows ...

The zip contains only the importable package (``locus_spark/**/*.py``) —
no tests, no tools, no caches — and is written deterministically (fixed
timestamps, sorted entries) so the same tree always produces the same
bytes: a re-submit of an unchanged job ships a byte-identical artifact,
which makes cluster-side artifact caching and provenance checks trivial.
"""

from __future__ import annotations

import argparse
import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = "locus_spark"
# fixed zip entry timestamp (zip format has no epoch-0; 1980 is its floor)
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out: pathlib.Path) -> list[str]:
    out.parent.mkdir(parents=True, exist_ok=True)
    entries = sorted(
        p for p in (REPO / PKG).rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in entries:
            arcname = str(p.relative_to(REPO))
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return [str(p.relative_to(REPO)) for p in entries]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "dist" / "locus_spark.zip"))
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    names = build(out)
    print(f"{out} ({out.stat().st_size:,} bytes, {len(names)} modules)")


if __name__ == "__main__":
    main()
