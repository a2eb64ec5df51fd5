"""End-to-end gallery indexing from JPEG bytes on disk: the number the
host+chip pipeline actually sustains, not the device-only encode rate.

Pipeline measured: disk -> MPLoader (N worker processes x native C++
decode threads, shared-memory transport) -> H2D -> jitted tower encode.
The encode dispatch is async, so decode of batch i+1 overlaps the chip on
batch i; the steady-state rate is min(host decode rate, chip encode rate)
and the report shows both plus the derived host-core budget.

Replaces the measurement the reference never had for its torch DataLoader
workers (clip4cir/train.py:77, num_workers=4).

Usage:
  python tools/e2e_index_bench.py --model test-tiny --n 256 --procs 2  # CPU
  python tools/e2e_index_bench.py --model "ViT-B/32" --n 2048 --procs 8
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--backbone", default="clip")
    p.add_argument("--n", type=int, default=2048, help="gallery images")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=400, help="source JPEG px")
    p.add_argument("--procs", type=int, default=4)
    p.add_argument("--threads", type=int, default=0,
                   help="native threads per worker (0 = default)")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon sitecustomize outranks the env var; force CPU back for
        # host-only smoke runs (tests/conftest.py pattern)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from spn4cir_tpu.data.mploader import MPLoader, batched_paths
    from spn4cir_tpu.models.api import build_backbone

    # synthetic gallery on disk (unique JPEGs; decode cost is size-driven)
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="e2e_index_")
    paths = []
    for i in range(args.n):
        arr = rng.randint(0, 256, (args.size, int(args.size * 1.3), 3),
                          dtype=np.uint8)
        path = os.path.join(tmp, f"img{i}.jpg")
        Image.fromarray(arr).save(path, quality=90)
        paths.append(path)

    backbone = build_backbone(args.backbone, clip_model_name=args.model)
    params = backbone.init_params(jax.random.PRNGKey(0))
    dim = backbone.input_dim
    encode = jax.jit(lambda p, im: backbone.gallery_features(p, im))

    # warm the compile + the worker pool
    warm = jnp.zeros((args.batch, dim, dim, 3), jnp.float32)
    encode(params, warm).block_until_ready()

    batches = batched_paths(paths, args.batch)
    results = {}
    with MPLoader("targetpad", dim, args.batch, num_procs=args.procs,
                  threads_per_proc=args.threads) as loader:
        # one warmup pass primes worker .so loads + page cache
        for arr, n in loader.map_batches(batches[:2]):
            encode(params, jnp.asarray(arr))
        best = 0.0
        for _ in range(args.repeats):
            feats = None
            t0 = time.monotonic()
            for arr, n in loader.map_batches(batches):
                feats = encode(params, jnp.asarray(arr))
            # fetch one scalar: the only reliable sync through the tunnel
            float(feats[0, 0])
            dt = time.monotonic() - t0
            best = max(best, args.n / dt)
        results["e2e"] = best

        # host-only rate (same pool, no device work): the decode ceiling
        t0 = time.monotonic()
        for arr, n in loader.map_batches(batches):
            pass
        results["host_only"] = args.n / (time.monotonic() - t0)

    # device-only rate for the same geometry (input already on device)
    dev_in = jnp.asarray(rng.rand(args.batch, dim, dim, 3).astype(np.float32))
    encode(params, dev_in).block_until_ready()
    t0 = time.monotonic()
    reps = max(args.n // args.batch, 1)
    for _ in range(reps):
        out = encode(params, dev_in)
    float(out[0, 0])
    results["device_only"] = reps * args.batch / (time.monotonic() - t0)

    cores = args.procs * (args.threads or min(8, os.cpu_count() or 1))
    per_core = results["host_only"] / max(cores, 1)
    budget = results["device_only"] / max(per_core, 1e-9)
    print(f"model {args.model} dim {dim} batch {args.batch} "
          f"procs {args.procs}")
    print(f"e2e from JPEG:  {results['e2e']:,.0f} img/s")
    print(f"host decode:    {results['host_only']:,.0f} img/s "
          f"({per_core:,.1f} img/s/thread over ~{cores} threads)")
    print(f"device encode:  {results['device_only']:,.0f} img/s/chip")
    print(f"host threads to saturate the chip: ~{budget:,.0f}")


if __name__ == "__main__":
    main()
