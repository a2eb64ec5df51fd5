"""Recall-parity harness: the tolerance ladder from SURVEY.md §7.

Compares this framework's eval outputs against reference dumps on the real
datasets (run offline where the PyTorch reference and data assets live):

  ladder rung 1: feature cosine similarity (> 0.999 per gallery image)
  ladder rung 2: identical top-K retrieved ids per query
  ladder rung 3: identical Recall@K numbers

Inputs are .npz dumps:
  reference dump: {"index_feats": (N, D), "query_feats": (Q, D),
                   "target_gid": (Q,), "refer_gid": (Q,)}
  ours: produced by `dump_predictions` below (or eval.cases.dump_cases).

Usage:
  python tools/parity_check.py --ours ours.npz --reference ref.npz [--k 10 50]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return np.sum(a * b, axis=-1)


def compare(ours: dict, ref: dict, ks=(10, 50)) -> dict:
    report = {}
    # rung 1: feature cosines
    for key in ("index_feats", "query_feats"):
        if key in ours and key in ref and ours[key].shape == ref[key].shape:
            cos = cosine_rows(ours[key], ref[key])
            report[f"{key}_cosine_min"] = float(cos.min())
            report[f"{key}_cosine_mean"] = float(cos.mean())
            report[f"{key}_rung1_pass"] = bool(cos.min() > 0.999)

    # rungs 2-3: rankings + recalls from each side's own features
    def ranks(d):
        scores = d["query_feats"] @ d["index_feats"].T
        q = np.arange(len(d["target_gid"]))
        tgt = scores[q, d["target_gid"]]
        greater = scores > tgt[:, None]
        greater[q, d["refer_gid"]] = False
        return greater.sum(axis=1), scores

    r_ours, s_ours = ranks(ours)
    r_ref, s_ref = ranks(ref)
    for k in ks:
        ro = float((r_ours < k).mean() * 100)
        rr = float((r_ref < k).mean() * 100)
        report[f"recall_at{k}_ours"] = ro
        report[f"recall_at{k}_ref"] = rr
        report[f"recall_at{k}_delta"] = ro - rr
    topk_ours = np.argsort(-s_ours, axis=1)[:, : max(ks)]
    topk_ref = np.argsort(-s_ref, axis=1)[:, : max(ks)]
    report["rung2_topk_match_frac"] = float((topk_ours == topk_ref).mean())
    report["rung3_pass"] = all(
        abs(report[f"recall_at{k}_delta"]) < 1e-9 for k in ks)
    return report


def dump_predictions(backbone_name: str, argv) -> str:
    """Run our eval pipeline and dump the comparison npz."""
    from spn4cir_tpu.cli.common import (base_parser, finalize_args,
                                        load_or_init_params, make_backbone,
                                        make_transform)
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.eval.retrieval import (extract_index_features,
                                            generate_val_predictions)
    from spn4cir_tpu.utils.seeding import seed_everything

    parser = base_parser()
    parser.add_argument("--dump_out", default="parity_ours.npz")
    args = parser.parse_args(argv)
    finalize_args(args)
    key = seed_everything(args.seed)
    bb = make_backbone(backbone_name, args)
    tf = make_transform(bb, args)
    params = load_or_init_params(bb, args, key)
    dts = args.dress_types[:1] if args.dataset == "fiq" else [None]
    kinds = dts[0] and [dts[0]]
    classic = CIRDataset(args.dataset, "val", "classic", tf, args.data_path, kinds)
    relative = CIRDataset(args.dataset, "val", "relative", tf, args.data_path, kinds)
    index = extract_index_features(bb, params, classic, 32)
    preds = generate_val_predictions(bb, params, relative, index, 32)
    np.savez(args.dump_out,
             index_feats=np.asarray(index.target),
             query_feats=preds["query_feats"],
             target_gid=preds["target_gid"],
             refer_gid=preds["refer_gid"])
    return args.dump_out


def main():
    import sys

    # `parity_check.py dump <backbone> <train/validate flags...>` produces
    # the ours.npz side of the ladder; the default invocation compares two
    # dumps (PARITY.md runbook steps 2-3).
    if len(sys.argv) > 1 and sys.argv[1] == "dump":
        if len(sys.argv) < 3:
            raise SystemExit("usage: parity_check.py dump <backbone> "
                             "[--dataset ... --data_path ... --dump_out ...]")
        out = dump_predictions(sys.argv[2], sys.argv[3:])
        print(f"wrote {out}")
        return
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--k", type=int, nargs="+", default=[10, 50])
    args = p.parse_args()
    ours = dict(np.load(args.ours))
    ref = dict(np.load(args.reference))
    print(json.dumps(compare(ours, ref, tuple(args.k)), indent=2))


if __name__ == "__main__":
    main()
