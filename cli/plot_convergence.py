"""Training-curve extraction from run logs (parity with reference
kpconv/plot_convergence.py, without the matplotlib dependency): parses the
framework's log files into CSV and prints an ASCII sparkline summary.

    python -m cli.plot_convergence --log checkpoints/exp/run.log --out curve.csv
"""

from __future__ import annotations

import argparse
import csv
import re
import sys

PATTERNS = [
    ("loss", re.compile(r"[Ll]oss:?\s+([0-9.]+)")),
    ("sem_miou", re.compile(r"Sem mIoU:\s+([0-9.]+)%")),
    ("ins_miou", re.compile(r"Ins mIoU:\s+([0-9.]+)%")),
    ("acc", re.compile(r"acc\s+([0-9.]+)%")),
    ("running_miou", re.compile(r"running mIoU\s+([0-9.]+)%")),
]

SPARK = "▁▂▃▄▅▆▇█"


def sparkline(vals):
    if not vals:
        return ""
    lo, hi = min(vals), max(vals)
    rng = (hi - lo) or 1.0
    return "".join(SPARK[int((v - lo) / rng * (len(SPARK) - 1))] for v in vals)


def main():
    p = argparse.ArgumentParser("training-curve extraction")
    p.add_argument("--log", type=str, required=True)
    p.add_argument("--out", type=str, default=None, help="CSV output path")
    args = p.parse_args()

    rows = []
    with open(args.log) as f:
        for i, line in enumerate(f):
            row = {"step": i}
            hit = False
            for name, pat in PATTERNS:
                m = pat.search(line)
                if m:
                    row[name] = float(m.group(1))
                    hit = True
            if hit:
                rows.append(row)
    if not rows:
        print("no metric lines found", file=sys.stderr)
        return

    keys = sorted({k for r in rows for k in r} - {"step"})
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        # subsample to 60 chars
        step = max(1, len(vals) // 60)
        sub = vals[::step]
        print(f"{k:>14}: {sparkline(sub)}  first {vals[0]:.3f}  last {vals[-1]:.3f}")
    if args.out:
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["step"] + keys)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
