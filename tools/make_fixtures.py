"""CLI: materialize the deterministic synthetic site fixtures.

``python tools/make_fixtures.py --tier t1 --out /tmp/site`` (SURVEY.md
§7.1). Wraps :func:`olx_ray.sources.sitegen.write_site`; goldens are
computed on demand from the same specs (olx_ray.sources.goldens)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="t1", choices=["t1", "t2", "bench"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    from olx_ray.sources.sitegen import write_site

    paths = write_site(args.tier, args.out)
    print(paths)


if __name__ == "__main__":
    main()
