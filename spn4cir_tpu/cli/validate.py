"""Generic validation driver behind every per-backbone `validate.py`
(replaces the reference's five copies of `clip4cir/validate.py:234-266`)."""

from __future__ import annotations

import json
from typing import Optional

from spn4cir_tpu.cli.common import (
    base_parser,
    finalize_args,
    load_or_init_params,
    make_backbone,
    make_transform,
)
from spn4cir_tpu.eval.metrics import fiq_average
from spn4cir_tpu.eval.retrieval import cirr_val_retrieval, fiq_val_retrieval
from spn4cir_tpu.utils.seeding import seed_everything


def validate_main(backbone_name: str, argv: Optional[list] = None, **parser_kw):
    args = base_parser(**parser_kw).parse_args(argv)
    finalize_args(args)
    key = seed_everything(args.seed)

    backbone = make_backbone(backbone_name, args)
    preprocess = make_transform(backbone, args)
    params = load_or_init_params(backbone, args, key)

    mesh = None
    if getattr(args, "mesh_model", 1) > 1 or args.mesh_data > 1:
        from spn4cir_tpu.parallel.tp import make_tp_mesh

        mesh = make_tp_mesh(data=args.mesh_data or None,
                            model=args.mesh_model)
        print(f"indexing mesh: data={mesh.shape['data']} "
              f"model={mesh.shape['model']}")

    if args.dataset == "cirr":
        results = cirr_val_retrieval(backbone, params, args.data_path,
                                     preprocess, batch_size=32, mesh=mesh)
    else:
        per_type = {}
        for dt in args.dress_types:
            per_type[dt] = fiq_val_retrieval(backbone, params, args.data_path,
                                             dt, preprocess, batch_size=32,
                                             fiq_val_type=args.fiq_val_type,
                                             mesh=mesh)
        results = {f"{dt}_{k}": v for dt, m in per_type.items()
                   for k, v in m.items()}
        results.update(fiq_average(list(per_type.values())))
    print(json.dumps(results, indent=2, sort_keys=True))
    return results
