"""Generic stage-2/stage-1 training driver — the single implementation behind
every per-backbone `train.py` (replaces the reference's five copies of
`clip4cir/train.py:25-197`)."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spn4cir_tpu.bank.bank import (
    extend_target_bank,
    extract_banks,
    extract_fusion_banks,
    extract_unlabeled_features,
)
from spn4cir_tpu.cli.common import (
    base_parser,
    finalize_args,
    load_or_init_params,
    make_backbone,
    make_transform,
    resolve_output_path,
)
from spn4cir_tpu.data.datasets import (
    CIRDataset,
    iter_train_bank,
    iter_train_images,
    iter_unique_images,
    iter_unlabeled,
)
from spn4cir_tpu.eval.retrieval import cirr_val_retrieval, fiq_val_retrieval
from spn4cir_tpu.eval.metrics import fiq_average
from spn4cir_tpu.train.stage1 import create_stage1_state, train_epoch_stage1
from spn4cir_tpu.train.stage2 import create_train_state, train_epoch
from spn4cir_tpu.parallel.loss import pad_bank_rows
from spn4cir_tpu.parallel.mesh import make_mesh, put_bank, replicate, shard_batch
from spn4cir_tpu.parallel.train import make_sharded_stage2_step
from spn4cir_tpu.utils.checkpoint import save_model
from spn4cir_tpu.utils.logging import MetricLogger
from spn4cir_tpu.utils.seeding import seed_everything


def _prepared_spec(backbone, args) -> str:
    """Producer-config key for the prepared-bank sidecar: the bank dtype
    plus the backbone's bank-spec geometry. A --bank_dtype flip or a
    backbone change onto the same --bank_path must MISS the sidecar, never
    silently load the other config's padded/transposed layout."""
    s = backbone.bank_spec()
    return (f"{args.bank_dtype}|target{tuple(s.target_shape)}"
            f"|{jnp.dtype(s.dtype).name}")


def run_validation(backbone, params, args, preprocess) -> tuple[float, dict]:
    """Per-epoch validation; score definitions mirror clip4cir/train.py:134-195."""
    if args.dataset == "cirr":
        m = cirr_val_retrieval(backbone, params, args.data_path, preprocess,
                               batch_size=32)
        return m["arithmetic_mean"], m
    per_type = []
    results = {}
    for dt in args.dress_types:
        m = fiq_val_retrieval(backbone, params, args.data_path, dt, preprocess,
                              batch_size=32,
                              fiq_val_type=getattr(args, "fiq_val_type", 0))
        per_type.append(m)
        results[dt] = m
    avg = fiq_average(per_type)
    results.update(avg)
    return avg["mean_recall"], results


def train_main(backbone_name: str, argv: Optional[list] = None, **parser_kw):
    args = base_parser(**parser_kw).parse_args(argv)
    finalize_args(args)
    if args.distributed:
        from spn4cir_tpu.parallel.mesh import initialize_distributed

        os.environ.setdefault("SPN4CIR_DISTRIBUTED", "1")
        if initialize_distributed():
            print(f"distributed: process {jax.process_index()}/"
                  f"{jax.process_count()}, {jax.device_count()} devices")
    key = seed_everything(args.seed)

    backbone = make_backbone(backbone_name, args)
    preprocess = make_transform(backbone, args)
    params = load_or_init_params(backbone, args, key)
    output_path = resolve_output_path(args, backbone_name)
    logger = MetricLogger(prefix=f"{backbone_name}-train")

    train_ds = CIRDataset(args.dataset, "train", "relative", preprocess,
                          args.data_path, args.dress_types, plus=args.plus,
                          llmcap=args.llmcap, use_cc=args.use_cc,
                          extend_suffix=backbone.extend_suffix, seed=args.seed,
                          replace_extended=backbone.replace_extended)

    # --- bank extraction (cached) ---
    # --mesh_model tensor-shards the frozen tower Megatron-style for this
    # encode-heavy phase (the EVA-g scan is blip2 training's dominant cost;
    # SURVEY §2.7) with images data-sharded across the remaining devices
    def tp_extract(fnc, n_batch_args):
        if getattr(args, "mesh_model", 1) <= 1:
            return jax.jit(lambda *a: fnc(params, *a))
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from spn4cir_tpu.parallel.tp import (make_tp_mesh, shard_params_tp,
                                             tp_param_shardings)

        tp_mesh = make_tp_mesh(model=args.mesh_model)
        print(f"extraction mesh: data={tp_mesh.shape['data']} "
              f"model={tp_mesh.shape['model']}")
        jitted = jax.jit(
            fnc,
            in_shardings=(tp_param_shardings(params, tp_mesh),)
            + (NamedSharding(tp_mesh, P("data")),) * n_batch_args,
            out_shardings=NamedSharding(tp_mesh, P()))
        return functools.partial(jitted, shard_params_tp(params, tp_mesh))

    # --device_preprocess: bank/gallery encoders absorb the device half of
    # the preprocess (RawBatch canvases -> resize/crop/normalize on-chip,
    # fused into the same jit; ops/preprocess.py:absorb_raw)
    def absorb(fnc):
        if not getattr(args, "device_preprocess", False):
            return fnc
        from spn4cir_tpu.ops.preprocess import absorb_raw

        return absorb_raw(fnc, backbone.input_dim, args.transform)

    bank = None
    if not args.wo_bank:
        bank_path = args.bank_path or os.path.join(
            output_path, f"{args.dataset}_bank.npz")
        if backbone_name == "blip2":
            # blip2 refer entries are caption-dependent fusion states
            fn = tp_extract(
                absorb(lambda p, imgs, txt: backbone.fusion_bank_features(
                    p, imgs, txt)), 2)
            bank = extract_fusion_banks(
                fn, iter_train_images(train_ds, args.batch_size),
                len(train_ds.triplets), train_ds.num_unique_images,
                backbone.tokenize, cache_path=bank_path,
                reload=args.reload_bank, by_image=args.plus)
        else:
            feats_fn = tp_extract(
                absorb(lambda p, imgs: backbone.bank_features(p, imgs)), 1)
            bank = extract_banks(
                feats_fn,
                iter_unique_images(train_ds, args.batch_size),
                train_ds.num_unique_images,
                cache_path=bank_path,
                reload=args.reload_bank,
            )
        if args.unlabeled:
            unlabeled_ds = CIRDataset(args.dataset, "train", "unlabeled",
                                      preprocess, args.data_path,
                                      args.dress_types,
                                      extend_suffix=backbone.extend_suffix)
            from spn4cir_tpu.bank.bank import Bank as _Bank

            enc = tp_extract(
                absorb(lambda p, imgs: backbone.gallery_features(p, imgs)), 1)
            # Derive from the RESOLVED cache name: an extensionless
            # --bank_path would otherwise make .replace a no-op and both
            # caches collide on the same <path>.npz.
            unlabeled_cache = _Bank.cache_file(bank_path).replace(
                ".npz", "_unlabeled.npz")
            extra = extract_unlabeled_features(
                enc, iter_unlabeled(unlabeled_ds, args.batch_size),
                len(unlabeled_ds.unlabeled_imagepaths),
                cache_path=unlabeled_cache,
                reload=args.reload_bank)
            bank = extend_target_bank(bank, extra,
                                      args.neg_num if args.neg_num > 0 else 0)
        # Prepared-layout sidecar cache: a previous run's post-quantize,
        # post-relayout target (bank.py:save_prepared_target) short-circuits
        # BOTH the dtype conversion below and the kernel relayout further
        # down. Keyed by --bank_dtype; stale (re-extracted / differently
        # extended) sidecars are rejected by shape.
        prepared_loaded = False
        if (not (args.neg_num > 0 and not args.unlabeled)
                and args.mesh_data <= 1 and args.mesh_bank <= 1
                and args.loss_impl != "xla"
                and jax.default_backend() == "tpu"
                and not args.reload_bank):
            from spn4cir_tpu.bank.bank import Bank, load_prepared_target

            prep = load_prepared_target(bank_path, args.bank_dtype,
                                        tuple(bank.target.shape),
                                        spec=_prepared_spec(backbone, args))
            if prep is not None:
                bank = Bank(refer=bank.refer, target=prep,
                            refer_key=bank.refer_key)
                prepared_loaded = True
                print("bank: prepared kernel layout loaded from cache "
                      f"({args.bank_dtype})")
        if not prepared_loaded and args.bank_dtype == "bfloat16":
            from spn4cir_tpu.bank.bank import Bank

            bank = Bank(refer=bank.refer,
                        target=bank.target.astype(jnp.bfloat16),
                        refer_key=bank.refer_key)
        elif not prepared_loaded and args.bank_dtype == "int8":
            from spn4cir_tpu.bank.bank import Bank
            from spn4cir_tpu.ops.bank_kernels import quantize_bank

            if args.neg_num > 0 and not args.unlabeled:
                raise SystemExit("--bank_dtype int8 needs the full-bank loss"
                                 " (no sampled negatives)")
            bank = Bank(refer=bank.refer,
                        target=quantize_bank(jnp.asarray(bank.target)),
                        refer_key=bank.refer_key)
        print(f"bank: {bank.num_images} images, refer {bank.refer.shape}, "
              f"target {bank.target.shape} {bank.target.dtype} -> {bank_path}")

    if args.lr_schedule != "constant":
        from spn4cir_tpu.train.stage2 import make_lr_schedule

        steps_per_epoch = max(len(train_ds.triplets) // args.batch_size, 1)
        lr = make_lr_schedule(args.lr_schedule, args.learning_rate,
                              steps_per_epoch, args.num_epochs,
                              args.warmup_steps)
    else:
        lr = args.learning_rate
    best_score = 0.0
    neg_num = args.neg_num if (args.neg_num > 0 and not args.unlabeled) else None
    neg_rng = np.random.RandomState(args.seed)

    # One-time kernel relayout of the frozen bank (pre-pad / pre-transpose)
    # so the jitted step carries no per-step relayout (~2.5 ms at blip2
    # CIRR scale). Only for the single-chip full-bank Pallas path: the
    # sampled-negatives path gathers raw rows, the mesh path pads via
    # pad_bank_rows, and the XLA path has no layout requirement.
    if (bank is not None and not neg_num
            and args.mesh_data <= 1 and args.mesh_bank <= 1
            and args.loss_impl != "xla"
            and jax.default_backend() == "tpu"):
        from spn4cir_tpu.bank.bank import Bank
        from spn4cir_tpu.ops.bank_kernels import QuantBank, prepare_bank
        from spn4cir_tpu.ops.maxquery_kernels import prepare_max_query_bank

        tgt = bank.target
        if getattr(tgt, "ndim", 2) == 3:
            tgt = prepare_max_query_bank(
                tgt if isinstance(tgt, QuantBank) else jnp.asarray(tgt))
        else:
            tgt = prepare_bank(tgt if isinstance(tgt, QuantBank)
                               else jnp.asarray(tgt))
        if tgt is not bank.target:
            bank = Bank(refer=bank.refer, target=tgt,
                        refer_key=bank.refer_key)
            print("bank: prepared kernel layout "
                  f"{tuple(bank.target.shape)}")
            from spn4cir_tpu.bank.bank import save_prepared_target

            f = save_prepared_target(bank_path, args.bank_dtype, tgt,
                                     spec=_prepared_spec(backbone, args))
            print(f"bank: prepared layout cached -> {f}")

    if args.wo_bank:
        state = create_stage1_state(backbone, params, lr)
    else:
        state = create_train_state(backbone, params, lr)

    # --- multi-chip mesh (pjit/shard_map path) ---
    mesh = None
    sharded_step = None
    use_mesh = (args.mesh_data > 1 or args.mesh_bank > 1
                or args.mesh_model > 1)
    train_mesh_model = args.mesh_model if use_mesh else 1
    if not args.wo_bank and use_mesh:
        # the sharded step covers the full-bank losses (flat and blip2
        # max-over-query) — refuse configurations it would misrepresent
        if neg_num:
            raise SystemExit("--neg_num (sampled negatives) is not supported"
                             " with a mesh; the sharded loss is full-bank")
        # --dropout composes with the mesh for MED-family backbones: the
        # fusion path takes a dropout_rng kwarg (blip fuse / blip2
        # stage2_query_feats); clip/tgcir warn-and-ignore (cli/common.py).
        # The probed method MUST be the one the sharded step dispatches to
        # (same condition as make_sharded_stage2_step's max_query).
        import inspect

        mesh_dropout_fn = (backbone.stage2_query_feats
                           if hasattr(backbone, "stage2_query_feats")
                           and len(backbone.bank_spec().target_shape) == 2
                           else backbone.fuse)
        mesh_dropout = bool(args.dropout) and (
            "dropout_rng" in inspect.signature(mesh_dropout_fn).parameters)
        if jax.process_count() > 1:
            # multi-host: data axis spans slices over DCN; bank AND the
            # TP model axis stay intra-slice so their per-step collectives
            # ride ICI
            from spn4cir_tpu.parallel.mesh import make_hybrid_mesh

            mesh = make_hybrid_mesh(bank=args.mesh_bank,
                                    model=train_mesh_model)
        else:
            # 3-axis (data, bank, model): TP on the live tower composes
            # with the bank-sharded loss in ONE jitted step
            mesh = make_mesh(data=args.mesh_data or None,
                             bank=args.mesh_bank, model=train_mesh_model)
        m_actual = int(bank.target.shape[0])
        bank_padded = put_bank(pad_bank_rows(bank.target, args.mesh_bank), mesh)
        if train_mesh_model > 1:
            from spn4cir_tpu.parallel.train import tp_state_shardings

            template = state
            state = jax.device_put(state, tp_state_shardings(state, mesh))
            sharded_step = make_sharded_stage2_step(
                backbone, mesh, m_actual=m_actual, state_template=template,
                with_dropout=mesh_dropout)
        else:
            state = replicate(state, mesh)
            sharded_step = make_sharded_stage2_step(
                backbone, mesh, m_actual=m_actual,
                with_dropout=mesh_dropout)
        print(f"mesh: data={mesh.shape['data']} bank={mesh.shape['bank']}"
              + (f" model={mesh.shape['model']}" if train_mesh_model > 1
                 else ""))
    elif args.wo_bank and use_mesh:
        # stage-1 over a (data[, model]) mesh: the live-tower regime is
        # where data parallelism pays most (both image towers encode every
        # step). No bank axis exists — stage-1 negatives are the batch.
        from spn4cir_tpu.parallel.train import make_sharded_stage1_step
        from spn4cir_tpu.train.stage1 import stage1_takes_dropout

        if args.mesh_bank > 1:
            raise SystemExit("--wo_bank (stage-1) has no bank axis; shard "
                             "with --mesh_data / --mesh_model")
        # the SAME predicate the epoch loop uses for the per-epoch key —
        # a mismatch would desync the step's batch pytree from its
        # in_shardings (train.stage1.stage1_takes_dropout is the one source)
        s1_mesh_dropout = (bool(args.dropout) and not args.neg_type
                           and stage1_takes_dropout(backbone))
        if jax.process_count() > 1:
            from spn4cir_tpu.parallel.mesh import make_hybrid_mesh

            mesh = make_hybrid_mesh(bank=1, model=train_mesh_model)
        else:
            mesh = make_mesh(data=args.mesh_data or None, bank=1,
                             model=train_mesh_model)
        if train_mesh_model > 1:
            from spn4cir_tpu.parallel.train import tp_state_shardings

            template = state
            state = jax.device_put(state, tp_state_shardings(state, mesh))
            sharded_step = make_sharded_stage1_step(
                backbone, mesh, state_template=template,
                with_dropout=s1_mesh_dropout, neg_type=args.neg_type,
                raw_kind=args.transform if args.device_preprocess else None)
        else:
            state = replicate(state, mesh)
            sharded_step = make_sharded_stage1_step(
                backbone, mesh, with_dropout=s1_mesh_dropout,
                neg_type=args.neg_type,
                raw_kind=args.transform if args.device_preprocess else None)
        print(f"mesh: data={mesh.shape['data']}"
              + (f" model={mesh.shape['model']}" if train_mesh_model > 1
                 else "") + " (stage-1)")

    # --- preemption resume (fixes the reference's no-resume gap, SURVEY §5) ---
    # Checkpoint keys are GLOBAL steps (epoch * steps_per_epoch + step):
    # --ckpt_every_steps N adds mid-epoch saves, and resume reconstructs
    # the exact position — the epoch shuffle is a pure function of
    # (seed, epoch), so skipping the first step_in_epoch batches replays
    # the remainder identically (see iter_train_* start_step).
    steps_per_epoch = max(len(train_ds.triplets) // args.batch_size, 1)
    ckpt_mgr = None
    start_epoch = 0
    start_step = 0
    if args.resume:
        from spn4cir_tpu.utils.checkpoint import CheckpointManager

        resume_dir = os.path.join(output_path, "resume")
        ckpt_mgr = CheckpointManager(resume_dir)
        # checkpoint keys are GLOBAL STEPS since round 3 (they were epoch
        # numbers before) — refuse to reinterpret old-format directories
        marker = os.path.join(resume_dir, "format.json")
        if ckpt_mgr.latest_step() is not None and not os.path.exists(marker):
            raise SystemExit(
                f"{resume_dir} holds checkpoints from the old epoch-keyed "
                "format; delete the directory (or finish that run with the "
                "old code) — resuming would restart at the wrong position")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                json.dump({"keys": "global_step",
                           "steps_per_epoch": steps_per_epoch}, f)
        state, global_step = ckpt_mgr.restore(state)
        start_epoch, start_step = divmod(global_step, steps_per_epoch)
        if global_step:
            print(f"resumed from epoch {start_epoch} step {start_step}")

    def make_step_hook(epoch):
        """Save every --ckpt_every_steps optimizer steps (async orbax)."""
        if ckpt_mgr is None or not args.ckpt_every_steps:
            return None

        def hook(step_in_epoch, st):
            gs = epoch * steps_per_epoch + step_in_epoch
            if gs % args.ckpt_every_steps == 0 and \
                    step_in_epoch < steps_per_epoch:
                ckpt_mgr.save(gs, st)
        return hook

    from spn4cir_tpu.utils.logging import profiler_trace

    trace_ctx = profiler_trace(args.profile_dir or None)
    trace_ctx.__enter__()
    for epoch in range(start_epoch, getattr(args, "num_epochs")):
        if mesh is not None and not args.wo_bank:
            from spn4cir_tpu.data.datasets import iter_train_bank as _itb

            # device-resident loss accumulation: no per-step host sync
            ep_start = start_step if epoch == start_epoch else 0
            hook = make_step_hook(epoch)
            # same (seed*1000+epoch, fold_in step) stream as the
            # single-chip path, so mesh runs replay identically
            ep_drop_rng = (jax.random.PRNGKey(args.seed * 1000 + epoch)
                           if mesh_dropout else None)
            loss_sum, count = None, 0
            for step, raw in enumerate(
                    _itb(train_ds, args.batch_size,
                         epoch_seed=args.seed + epoch, start_step=ep_start),
                    start=ep_start):
                batch = shard_batch({
                    "refer_feats": jnp.asarray(bank.gather_refer(raw)),
                    "text_ids": jnp.asarray(backbone.tokenize(raw["captions"])),
                    "labels": jnp.asarray(raw["target_image_id"]),
                }, mesh)
                if ep_drop_rng is not None:
                    batch["dropout_rng"] = replicate(
                        jax.random.fold_in(ep_drop_rng, step), mesh)
                state, loss = sharded_step(state, bank_padded, batch)
                loss_sum = loss if loss_sum is None else loss_sum + loss
                count += 1
                if hook is not None:
                    hook(step + 1, state)
            mean_loss = float(loss_sum) / count if count else 0.0
        elif args.wo_bank:
            # stage-1 dropout: only backbones whose stage1_loss takes a
            # dropout rng (MED family) run train-mode dropout, matching
            # the reference's torch train() stage-1 regime. The predicate
            # is the mesh block's s1_mesh_dropout (one source, see above).
            from spn4cir_tpu.train.stage1 import stage1_takes_dropout

            s1_dropout = None
            if args.dropout and not args.neg_type and \
                    stage1_takes_dropout(backbone):
                s1_dropout = jax.random.PRNGKey(args.seed * 1000 + epoch)
            ep_start = start_step if epoch == start_epoch else 0
            state, mean_loss = train_epoch_stage1(
                backbone, state,
                iter_train_images(train_ds, args.batch_size, shuffle=True,
                                  epoch_seed=args.seed + epoch,
                                  start_step=ep_start),
                neg_type=args.neg_type, dropout_rng=s1_dropout,
                step_hook=make_step_hook(epoch), start_step=ep_start,
                sharded_step=sharded_step, mesh=mesh,
                raw_kind=(args.transform if args.device_preprocess
                          else None),
                log_fn=lambda step, loss: logger.log(step, epoch=epoch, loss=loss))
        else:
            # only backbones whose stage2_loss takes a dropout rng get one —
            # clip/tgcir warn-and-ignore --dropout (see cli/common.py)
            import inspect

            takes_dropout = ("dropout_rng"
                             in inspect.signature(backbone.stage2_loss).parameters)
            drop_rng = (jax.random.PRNGKey(args.seed * 1000 + epoch)
                        if args.dropout and takes_dropout else None)
            ep_start = start_step if epoch == start_epoch else 0
            state, mean_loss = train_epoch(
                backbone, state, bank,
                iter_train_bank(train_ds, args.batch_size,
                                epoch_seed=args.seed + epoch,
                                start_step=ep_start),
                impl=args.loss_impl, neg_num=neg_num,
                neg_seed=args.seed * 1000 + epoch,
                dropout_rng=drop_rng,
                step_hook=make_step_hook(epoch), start_step=ep_start,
                log_fn=lambda step, loss: logger.log(step, epoch=epoch, loss=loss))
        print(f"epoch {epoch}: mean loss {mean_loss:.4f}")

        if (epoch + 1) % args.validation_frequency == 0:
            score, results = run_validation(backbone, state.params, args, preprocess)
            print(json.dumps({"epoch": epoch, "score": score, **{
                k: v for k, v in results.items() if isinstance(v, float)}}))
            if args.nni:  # HPO reporting (ref clip4cir/train.py:157,188)
                try:
                    import nni

                    nni.report_intermediate_result(score)
                except ImportError:
                    pass
            if score > best_score:
                best_score = score
                save_model(os.path.join(output_path, "best.msgpack"),
                           state.params, epoch=epoch,
                           extra={"score": score, "dataset": args.dataset})
                print(f"saved best (score {score:.2f})")
        if ckpt_mgr is not None:
            ckpt_mgr.save((epoch + 1) * steps_per_epoch, state)
    if ckpt_mgr is not None:
        ckpt_mgr.wait()
    trace_ctx.__exit__(None, None, None)
    if args.nni:  # (ref clip4cir/train.py:196-197)
        try:
            import nni

            nni.report_final_result(best_score)
        except ImportError:
            pass
    print(f"best score: {best_score:.2f}")
    return best_score
