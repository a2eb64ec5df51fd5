"""Generic CIRR test-submission driver behind every per-backbone
`cirr_test_submission.py` (replaces the five reference copies)."""

from __future__ import annotations

from typing import Optional

from spn4cir_tpu.cli.common import (
    base_parser,
    finalize_args,
    load_or_init_params,
    make_backbone,
    make_transform,
)
from spn4cir_tpu.eval.submission import generate_cirr_test_submissions
from spn4cir_tpu.utils.seeding import seed_everything


def submission_main(backbone_name: str, argv: Optional[list] = None, **parser_kw):
    parser = base_parser(**parser_kw)
    parser.add_argument("--submission-name", default="tpu", type=str,
                        help="file_name suffix of the submission JSONs")
    args = parser.parse_args(argv)
    if args.dataset != "cirr":
        raise SystemExit("CIRR test submissions require --dataset cirr")
    finalize_args(args)
    key = seed_everything(args.seed)

    backbone = make_backbone(backbone_name, args)
    preprocess = make_transform(backbone, args)
    params = load_or_init_params(backbone, args, key)

    p1, p2 = generate_cirr_test_submissions(
        backbone, params, args.submission_name, preprocess, args.data_path)
    print(f"wrote {p1}\nwrote {p2}")
    return p1, p2
