"""Checkpoint converter tests: synthesize an OpenAI-layout torch state dict
for the tiny config, convert, and verify the flax model consumes it with the
expected numerics (qkv packing order, transpose conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.models.convert import convert_clip_state_dict, load_torch_checkpoint


def make_torch_clip_sd(cfg, rng):
    """Random OpenAI-CLIP-layout state dict matching `cfg` (ViT)."""
    sd = {}
    w = cfg.vision_width
    p = cfg.vision_patch_size
    d = cfg.transformer_width

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd["visual.conv1.weight"] = t(w, 3, p, p)
    sd["visual.class_embedding"] = t(w)
    n_pos = (cfg.image_resolution // p) ** 2 + 1
    sd["visual.positional_embedding"] = t(n_pos, w)
    sd["visual.ln_pre.weight"] = t(w)
    sd["visual.ln_pre.bias"] = t(w)
    sd["visual.ln_post.weight"] = t(w)
    sd["visual.ln_post.bias"] = t(w)
    sd["visual.proj"] = t(w, cfg.embed_dim)

    def resblock(prefix, dim):
        sd[f"{prefix}.ln_1.weight"] = t(dim)
        sd[f"{prefix}.ln_1.bias"] = t(dim)
        sd[f"{prefix}.ln_2.weight"] = t(dim)
        sd[f"{prefix}.ln_2.bias"] = t(dim)
        sd[f"{prefix}.attn.in_proj_weight"] = t(3 * dim, dim)
        sd[f"{prefix}.attn.in_proj_bias"] = t(3 * dim)
        sd[f"{prefix}.attn.out_proj.weight"] = t(dim, dim)
        sd[f"{prefix}.attn.out_proj.bias"] = t(dim)
        sd[f"{prefix}.mlp.c_fc.weight"] = t(4 * dim, dim)
        sd[f"{prefix}.mlp.c_fc.bias"] = t(4 * dim)
        sd[f"{prefix}.mlp.c_proj.weight"] = t(dim, 4 * dim)
        sd[f"{prefix}.mlp.c_proj.bias"] = t(dim)

    for i in range(cfg.vision_layers):
        resblock(f"visual.transformer.resblocks.{i}", w)
    for i in range(cfg.transformer_layers):
        resblock(f"transformer.resblocks.{i}", d)

    sd["token_embedding.weight"] = t(cfg.vocab_size, d)
    sd["positional_embedding"] = t(cfg.context_length, d)
    sd["ln_final.weight"] = t(d)
    sd["ln_final.bias"] = t(d)
    sd["text_projection"] = t(d, cfg.embed_dim)
    sd["logit_scale"] = torch.tensor(np.float32(2.6593))
    return sd


@pytest.fixture(scope="module")
def bb():
    return build_backbone("clip", clip_model_name="test-tiny")


def test_convert_structure_and_forward(bb, rng):
    sd = make_torch_clip_sd(bb.cfg, rng)
    params = convert_clip_state_dict(sd, bb.cfg.vision_layers,
                                     bb.cfg.transformer_layers, is_vit=True)
    template = bb.init_params(jax.random.PRNGKey(0))
    # same tree structure
    assert (jax.tree_util.tree_structure(template)
            == jax.tree_util.tree_structure(params))
    imgs = jnp.ones((1, bb.input_dim, bb.input_dim, 3))
    feats = bb.encode_image(params, imgs)
    assert feats.shape == (1, bb.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_qkv_packing_order(bb, rng):
    """The fused qkv kernel must preserve torch's q/k/v concat order: feeding
    in_proj as [Wq; Wk; Wv] must give q = x @ Wq.T + bq in our Dense."""
    sd = make_torch_clip_sd(bb.cfg, rng)
    params = convert_clip_state_dict(sd, bb.cfg.vision_layers,
                                     bb.cfg.transformer_layers, is_vit=True)
    d = bb.cfg.transformer_width
    kernel = np.asarray(
        params["params"]["text"]["transformer"]["blocks"]["block"]["attn"]["qkv"]["kernel"])
    in_proj = sd["transformer.resblocks.0.attn.in_proj_weight"].numpy()
    x = rng.randn(d).astype(np.float32)
    np.testing.assert_allclose(x @ kernel[0][:, :d], in_proj[:d] @ x, atol=1e-5)
    np.testing.assert_allclose(x @ kernel[0][:, d:2*d], in_proj[d:2*d] @ x, atol=1e-5)


def test_load_torch_checkpoint_wrappers(bb, rng, tmp_path):
    sd = make_torch_clip_sd(bb.cfg, rng)
    template = bb.init_params(jax.random.PRNGKey(0))
    for wrapper in (lambda s: s,
                    lambda s: {"state_dict": s},
                    lambda s: {"CLIP": s}):
        path = str(tmp_path / "ckpt.pt")
        torch.save(wrapper(sd), path)
        params = load_torch_checkpoint(path, bb, template)
        np.testing.assert_allclose(
            np.asarray(params["params"]["logit_scale"]), 2.6593, rtol=1e-5)


def test_fp16_upcast(bb, rng, tmp_path):
    sd = {k: v.half() for k, v in make_torch_clip_sd(bb.cfg, rng).items()}
    path = str(tmp_path / "fp16.pt")
    torch.save(sd, path)
    template = bb.init_params(jax.random.PRNGKey(0))
    params = load_torch_checkpoint(path, bb, template)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
