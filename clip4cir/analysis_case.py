"""Thin CLI wrapper over the shared core. Reference counterpart: clip4cir/analysis_case.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json

from spn4cir_tpu.eval.cases import compare_cases, export_case_images

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cases_a", required=True, help="model A case dump (fails)")
    p.add_argument("--cases_b", required=True, help="model B case dump (wins)")
    p.add_argument("--fail_rank", type=int, default=10)
    p.add_argument("--win_rank", type=int, default=0)
    p.add_argument("--out_dir", default="cases/compare")
    p.add_argument("--name_to_path", default="", help="JSON {name: image path}")
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()
    with open(args.cases_a) as f:
        a = json.load(f)
    with open(args.cases_b) as f:
        b = json.load(f)
    wins = compare_cases(a, b, args.fail_rank, args.win_rank)
    print(f"{len(wins)} queries where A fails and B wins")
    if args.name_to_path:
        with open(args.name_to_path) as f:
            n2p = json.load(f)
        n = export_case_images(wins, n2p, args.out_dir, args.limit)
        print(f"exported {n} images to {args.out_dir}")
