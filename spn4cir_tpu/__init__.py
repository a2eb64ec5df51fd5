"""spn4cir_tpu — TPU-native composed-image-retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
BUAADreamer/SPN4CIR (see SURVEY.md): two-stage contrastive CIR training with
scaled positives (generated triplets) and scaled negatives (device-resident
feature memory banks), four supervised backbones (clip4cir, tgcir, blip4cir,
blip24cir) plus zero-shot (zscir), FashionIQ/CIRR evaluation and CIRR
test-server submission, and an offline positive-generation pipeline.

Unlike the reference's five copy-pasted PyTorch trees, L2-L5 (data, banks,
training, eval) are implemented once here and parameterized by a small
backbone protocol (`spn4cir_tpu.models.api.CIRBackbone`).
"""

__version__ = "0.1.0"


def _honor_env_platform() -> None:
    """Restore standard JAX semantics for JAX_PLATFORMS under plugin
    sitecustomize overrides.

    The axon TPU plugin's sitecustomize calls
    `jax.config.update("jax_platforms", ...)`, which OUTRANKS the
    JAX_PLATFORMS env var — so `JAX_PLATFORMS=cpu python zscir/train.py ...`
    would silently initialize (or hang on) the TPU tunnel. If the user set
    the env var explicitly, put it back in charge. No backend is
    initialized here; config.update is trace-free."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except Exception:  # jax missing/oddly configured: not our problem here
        pass


_honor_env_platform()
