"""Activation-level parity against the ACTUAL reference CLIP implementation.

Loads the reference's vendored `clip/model.py` (PyTorch, importable with
torch+numpy only), instantiates its CLIP with random weights, converts the
state dict through `spn4cir_tpu.models.convert`, and compares encoder outputs
numerically — the strongest parity evidence available without the real
datasets/checkpoints (SURVEY.md §7 "hard parts": tolerance ladder rung 1).

Skipped when /root/reference is not mounted. The reference module is
imported read-only as a test oracle; no reference code ships in this repo.
"""

import importlib.util
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_MODEL = "/root/reference/clip4cir/clip/model.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_MODEL),
                                reason="reference repo not mounted")

from spn4cir_tpu.models.clip import CLIP, CLIPConfig  # noqa: E402
from spn4cir_tpu.models.convert import convert_clip_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_clip_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# heads must be width // 64 for the reference's head computation
VIT_CFG = CLIPConfig(64, 32, 2, 64, 16, context_length=16, vocab_size=256,
                     transformer_width=64, transformer_heads=1,
                     transformer_layers=2)


def _build_pair(ref_mod, cfg, seed=0):
    ref_model = ref_mod.CLIP(
        cfg.embed_dim, cfg.image_resolution, cfg.vision_layers,
        cfg.vision_width, cfg.vision_patch_size, cfg.context_length,
        cfg.vocab_size, cfg.transformer_width, cfg.transformer_heads,
        cfg.transformer_layers).float().eval()
    torch.manual_seed(seed)
    # randomize all weights so the comparison is non-trivial
    with torch.no_grad():
        for p in ref_model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    sd = {k: v for k, v in ref_model.state_dict().items()}
    params = convert_clip_state_dict(
        sd, cfg.vision_layers, cfg.transformer_layers, is_vit=cfg.is_vit)
    ours = CLIP(cfg)
    return ref_model, ours, params


def test_vit_image_encoder_parity(ref_mod, rng):
    ref_model, ours, params = _build_pair(ref_mod, VIT_CFG)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model.encode_image(
            torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(imgs),
                                method="encode_image"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_text_encoder_parity(ref_mod, rng):
    ref_model, ours, params = _build_pair(ref_mod, VIT_CFG)
    # ids with a clear EOT (max id) at varying positions; no zeros before EOT
    ids = rng.randint(1, 200, size=(3, 16)).astype(np.int64)
    ids[0, 5] = 255
    ids[1, 9] = 255
    ids[2, 15] = 255
    with torch.no_grad():
        want = ref_model.encode_text(torch.tensor(ids)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(ids, dtype=jnp.int32),
                                method="encode_text"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_resnet_image_encoder_parity(ref_mod, rng):
    cfg = CLIPConfig(64, 64, (1, 1, 1, 1), 8, None, context_length=16,
                     vocab_size=256, transformer_width=64,
                     transformer_heads=1, transformer_layers=2)
    ref_model, ours, params = _build_pair(ref_mod, cfg)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model.encode_image(
            torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ours.apply(
        params, jnp.asarray(imgs), method="encode_image",
        mutable=False))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_full_clip_forward_parity(ref_mod, rng):
    ref_model, ours, params = _build_pair(ref_mod, VIT_CFG)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    ids = rng.randint(1, 200, size=(2, 16)).astype(np.int64)
    ids[:, 10] = 255
    with torch.no_grad():
        want_img = ref_model.encode_image(
            torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
        want_txt = ref_model.encode_text(torch.tensor(ids)).numpy()
    got_img, got_txt, _ = ours.apply(params, jnp.asarray(imgs),
                                     jnp.asarray(ids, dtype=jnp.int32))
    # cosine > 0.9999: rung-1 of the parity ladder at float32
    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return np.sum(a * b, axis=-1)

    assert cos(np.asarray(got_img), want_img).min() > 0.9999
    assert cos(np.asarray(got_txt), want_txt).min() > 0.9999
