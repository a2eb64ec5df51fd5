"""Thin CLI wrapper over the shared core. Reference counterpart: clip4cir/validate_case.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

from spn4cir_tpu.cli.common import (
    base_parser, finalize_args, load_or_init_params, make_backbone,
    make_transform)
from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.eval.cases import dump_cases
from spn4cir_tpu.eval.retrieval import extract_index_features
from spn4cir_tpu.utils.seeding import seed_everything

if __name__ == "__main__":
    parser = base_parser(default_model="RN50x4", default_tau=0.02)
    parser.add_argument("--cases_out", default="cases/model.json")
    args = parser.parse_args()
    finalize_args(args)
    key = seed_everything(args.seed)
    bb = make_backbone("clip", args)
    tf = make_transform(bb, args)
    params = load_or_init_params(bb, args, key)
    dts = args.dress_types if args.dataset == "fiq" else [None]
    for dt in dts:
        kinds = [dt] if dt else None
        classic = CIRDataset(args.dataset, "val", "classic", tf, args.data_path, kinds)
        relative = CIRDataset(args.dataset, "val", "relative", tf, args.data_path, kinds)
        index = extract_index_features(bb, params, classic, 32)
        out = args.cases_out if not dt else args.cases_out.replace(".json", f".{dt}.json")
        cases = dump_cases(bb, params, relative, index, out)
        hits = sum(c["rank"] < 10 for c in cases)
        print(json.dumps({"dress_type": dt, "queries": len(cases),
                          "recall_at10": (100.0 * hits / len(cases)
                                          if cases else 0.0),
                          "out": out}))
