"""Serving CLI: index a gallery and stand up the retrieval HTTP service.

The reference has no CIR serving entry point (SURVEY.md §5 — its only
serving stack is the vendored LLaVA REST tree, MLLM-only); this launcher
completes the production path: load a (converted) checkpoint, encode the
gallery split on device, and serve `/retrieve` + `/gallery/add` +
`/healthz`.

Scale-out knobs (TPU-native, compose freely):
  --mesh_data/--mesh_model  shard the one-off gallery ENCODE (dp × tp)
  --mesh_bank               shard the resident gallery + distributed top-k
                            (`serve/sharded.py`) for galleries too big for
                            one chip's HBM
  --serve_batch             micro-batch concurrent queries into one device
                            dispatch (`BatchingRetrievalService`)
"""

from __future__ import annotations

from typing import Optional

from spn4cir_tpu.cli.common import (
    base_parser,
    finalize_args,
    load_or_init_params,
    make_backbone,
    make_transform,
)
from spn4cir_tpu.utils.seeding import seed_everything


def serve_main(backbone_name: str, argv: Optional[list] = None, **parser_kw):
    p = base_parser(**parser_kw)
    p.add_argument("--serve_host", default="0.0.0.0")
    p.add_argument("--serve_port", type=int, default=8080)
    p.add_argument("--serve_split", default="val", choices=["val", "test1"],
                   help="gallery split to index (classic mode)")
    p.add_argument("--default_k", type=int, default=10)
    p.add_argument("--serve_batch", type=int, default=0,
                   help="micro-batch size for coalescing concurrent queries "
                        "(0 = dispatch per query)")
    p.add_argument("--gallery_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="resident gallery precision; int8 quantizes per "
                        "row (4x the gallery per chip, dequant fused after "
                        "the score matmul)")
    p.add_argument("--index_cache", default="",
                   help="npz path for the encoded gallery index; loaded if "
                        "present (restart without re-encoding), written "
                        "after extraction otherwise — same semantics as "
                        "--bank_path caching")
    p.add_argument("--block", action="store_true", default=True,
                   help="block the main thread on the server (default)")
    p.add_argument("--no-block", dest="block", action="store_false",
                   help="return the server instead of blocking (tests)")
    args = p.parse_args(argv)
    finalize_args(args)
    key = seed_everything(args.seed)

    backbone = make_backbone(backbone_name, args)
    preprocess = make_transform(backbone, args)
    params = load_or_init_params(backbone, args, key)

    import os

    from spn4cir_tpu.eval.retrieval import GalleryIndex, extract_index_features

    cache = args.index_cache
    if cache and os.path.exists(cache if cache.endswith(".npz")
                                else cache + ".npz"):
        index = GalleryIndex.load(cache)
        print(f"gallery index loaded from cache: {len(index.names)} images")
    else:
        from spn4cir_tpu.data.datasets import CIRDataset

        index_mesh = None
        if args.mesh_model > 1 or args.mesh_data > 1:
            from spn4cir_tpu.parallel.tp import make_tp_mesh

            index_mesh = make_tp_mesh(data=args.mesh_data or None,
                                      model=args.mesh_model)
        classic = CIRDataset(args.dataset, args.serve_split, "classic",
                             preprocess, args.data_path,
                             args.dress_types if args.dataset == "fiq"
                             else None)
        index = extract_index_features(backbone, params, classic,
                                       args.batch_size, num_workers=0,
                                       mesh=index_mesh)
        if args.gallery_dtype != "float32":
            import jax.numpy as jnp

            from spn4cir_tpu.ops.bank_kernels import quantize_bank

            target = (quantize_bank(index.target)
                      if args.gallery_dtype == "int8"
                      else index.target.astype(jnp.bfloat16))
            index = GalleryIndex(target=target, refer=index.refer,
                                 names=index.names)
        if cache:
            index.save(cache)
            print(f"gallery index cached -> {cache}")
        print(f"gallery indexed: {len(index.names)} images "
              f"({args.gallery_dtype})")

    kw = dict(preprocess=preprocess, default_k=args.default_k)
    if args.mesh_bank > 1:
        import jax

        from spn4cir_tpu.parallel.mesh import make_mesh
        from spn4cir_tpu.serve import (
            ShardedBatchingRetrievalService, ShardedRetrievalService)

        devices = jax.devices()
        if args.mesh_bank > len(devices):
            raise SystemExit(f"--mesh_bank {args.mesh_bank} exceeds the "
                             f"{len(devices)} visible devices")
        # a subset is fine: the gallery shards over the first N chips and
        # the rest stay free for other workloads
        mesh = make_mesh(data=1, bank=args.mesh_bank,
                         devices=devices[:args.mesh_bank])
        if args.serve_batch > 0:
            service = ShardedBatchingRetrievalService(
                backbone, params, index, mesh,
                max_batch=args.serve_batch, **kw)
        else:
            service = ShardedRetrievalService(backbone, params, index, mesh,
                                              **kw)
        # the sharded service keeps a host-side copy; drop the dense
        # device-resident gallery so it doesn't hold one chip's HBM for
        # the server's lifetime (the sharding exists to avoid exactly that)
        index = None
        print(f"gallery sharded over {args.mesh_bank} devices")
    else:
        from spn4cir_tpu.serve import BatchingRetrievalService, RetrievalService

        if args.serve_batch > 0:
            service = BatchingRetrievalService(backbone, params, index,
                                               max_batch=args.serve_batch,
                                               **kw)
        else:
            service = RetrievalService(backbone, params, index, **kw)

    from spn4cir_tpu.serve import serve

    server = serve(service, host=args.serve_host, port=args.serve_port)
    print(f"serving on {server.server_address[0]}:{server.server_address[1]}"
          f" (k={args.default_k}, batch={args.serve_batch or 'off'})",
          flush=True)
    if args.block:  # pragma: no cover — foreground production mode
        import threading

        threading.Event().wait()
    return server, service
