"""Parse eval_final.log chamfer lines into a CSV.

Reference parity: evaluation/log_to_csv.py (INFO:root:scan: ... -> CSV with
scan, d2s, s2d, all columns).
"""
from __future__ import annotations

import argparse
import csv
import re


def parse_log(path: str):
    rows = []
    pat = re.compile(
        r"scan:\s*(\d+)\s+([0-9.eE+-]+)\s+([0-9.eE+-]+)\s+([0-9.eE+-]+)")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append({
                    "scan": int(m.group(1)),
                    "d2s": float(m.group(2)),
                    "s2d": float(m.group(3)),
                    "all": float(m.group(4)),
                })
    return rows


def main(argv=None):
    p = argparse.ArgumentParser("log_to_csv")
    p.add_argument("--log", type=str, default="eval_final.log")
    p.add_argument("--out", type=str, default="out.csv")
    a = p.parse_args(argv)

    rows = parse_log(a.log)
    with open(a.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["scan", "d2s", "s2d", "all"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
        if rows:
            w.writerow({
                "scan": "mean",
                "d2s": sum(r["d2s"] for r in rows) / len(rows),
                "s2d": sum(r["s2d"] for r in rows) / len(rows),
                "all": sum(r["all"] for r in rows) / len(rows),
            })
    print(f"wrote {a.out} ({len(rows)} scans)")


if __name__ == "__main__":
    main()
