#!/usr/bin/env python3
"""Fetch the UCI bag-of-words datasets (the reference's benchmark
corpora, BASELINE.md) from pinned URLs, verify the documented header
shapes, and pin SHA256 digests trust-on-first-use.

No egress exists in the build environment, so the digests cannot be
pre-pinned; the first successful fetch writes them to checksums.json and
every subsequent fetch enforces them (and the header shapes below are an
independent integrity check that IS pre-pinned, from the UCI dataset
documentation).

Usage: python parity/fetch_uci.py [--data-dir DIR] [--dataset NAME ...]
Exit 0 with "SKIP" when the network is unavailable.
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import json
import os
import sys
import urllib.error
import urllib.request

BASE = "https://archive.ics.uci.edu/ml/machine-learning-databases/bag-of-words/"

# (docs, vocab, total nnz lines) — the three header lines of each
# docword file, per the UCI Bag of Words dataset documentation.
DATASETS = {
    "kos": dict(header=(3430, 6906, 353160)),
    "nips": dict(header=(1500, 12419, 746316)),
    "enron": dict(header=(39861, 28102, 3710420)),
    "nytimes": dict(header=(300000, 102660, 69679427)),
    "pubmed": dict(header=(8200000, 141043, 483450157)),
}


def _files(name: str):
    return [f"docword.{name}.txt.gz", f"vocab.{name}.txt"]


def fetch(name: str, data_dir: str, checksums: dict) -> bool:
    ok = True
    for fname in _files(name):
        url = BASE + fname
        dest = os.path.join(data_dir, fname)
        if not os.path.exists(dest):
            print(f"fetching {url}")
            try:
                with urllib.request.urlopen(url, timeout=120) as r, \
                        open(dest + ".part", "wb") as f:
                    while True:
                        buf = r.read(1 << 22)
                        if not buf:
                            break
                        f.write(buf)
                os.rename(dest + ".part", dest)
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                print(f"SKIP: network unavailable for {url}: {e}")
                return False
        h = hashlib.sha256()
        with open(dest, "rb") as f:
            for buf in iter(lambda: f.read(1 << 22), b""):
                h.update(buf)
        digest = h.hexdigest()
        pinned = checksums.get(fname)
        if pinned is None:
            checksums[fname] = digest
            print(f"pinned (trust-on-first-use) {fname}: {digest}")
        elif pinned != digest:
            print(f"FAIL: {fname} sha256 {digest} != pinned {pinned}")
            ok = False
    # independent integrity check: the documented header shape
    dw = os.path.join(data_dir, f"docword.{name}.txt.gz")
    with gzip.open(dw, "rt") as f:
        head = tuple(int(next(f)) for _ in range(3))
    want = DATASETS[name]["header"]
    if head != want:
        print(f"FAIL: {name} header {head} != documented {want}")
        ok = False
    else:
        print(f"{name}: header OK {head}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="parity/data")
    ap.add_argument("--dataset", nargs="*", default=["kos", "nips"])
    args = ap.parse_args()
    os.makedirs(args.data_dir, exist_ok=True)
    cpath = os.path.join(os.path.dirname(__file__), "checksums.json")
    checksums = {}
    if os.path.exists(cpath):
        checksums = json.load(open(cpath))
    ok = True
    for name in args.dataset:
        if name not in DATASETS:
            print(f"unknown dataset {name}; choices: {sorted(DATASETS)}")
            return 2
        ok &= fetch(name, args.data_dir, checksums)
    if checksums:  # only materialize the TOFU store once something is pinned
        with open(cpath, "w") as f:
            json.dump(checksums, f, indent=1, sort_keys=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
