"""Label visualization CLI (parity with reference seggroup/visualize.py,
whose argparse was broken as shipped — SURVEY.md S14): recolor a mesh by an
exported label file and write a PLY.

    python -m cli.visualize --mesh scene0000_00_vh_clean_2.ply \
        --labels results/exp/scene0000_00/ins_infer/final.sem.txt \
        --label_type semantic --out vis/scene0000_00.sem.ply
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from seggroup_tpu.data.visualize import visualize_labels


def main():
    p = argparse.ArgumentParser("label visualization")
    p.add_argument("--mesh", type=str, required=True)
    p.add_argument("--labels", type=str, required=True,
                   help="txt file, one int per vertex")
    p.add_argument("--label_type", type=str, default="semantic",
                   choices=["semantic", "instance", "segment"])
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    labels = np.loadtxt(args.labels, dtype=np.int64)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    visualize_labels(args.mesh, labels, args.out, args.label_type,
                     args.shuffle)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
