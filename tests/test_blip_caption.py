"""BLIP captioner: end-to-end caption contract on tiny geometry, converter
schema round-trip, and tokenizer decode parity vs HF."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spn4cir_tpu.models.blip_caption import BlipCaptioner, CAPTION_PROMPT
from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab


@pytest.fixture(scope="module")
def tiny_captioner():
    cap = BlipCaptioner("test-tiny", prompt="a dress with ")
    params = cap.init_params(jax.random.PRNGKey(0))
    return cap, params


def test_caption_contract(tiny_captioner):
    cap, params = tiny_captioner
    rng = np.random.RandomState(0)
    images = rng.rand(2, cap.input_dim, cap.input_dim, 3).astype(np.float32)
    caps = cap.caption(params, images, num_beams=3, max_length=12, min_length=4)
    assert len(caps) == 2
    assert all(isinstance(c, str) for c in caps)
    # deterministic under beam search
    caps2 = cap.caption(params, images, num_beams=3, max_length=12, min_length=4)
    assert caps == caps2
    # prompt stripped by character count (ref blip_caption.py:202-205)
    full = cap.tokenizer.batch_decode(np.asarray(cap._generate_ids(
        params, cap.encode(params, images), jnp.asarray(cap.prompt_ids(2)),
        jax.random.PRNGKey(0), num_beams=3, max_length=12, min_length=4)))
    assert [t[len(cap.prompt):] for t in full] == caps


def test_caption_nucleus_varies_with_rng(tiny_captioner):
    cap, params = tiny_captioner
    rng = np.random.RandomState(1)
    images = rng.rand(2, cap.input_dim, cap.input_dim, 3).astype(np.float32)
    a = cap.caption(params, images, use_nucleus_sampling=True, max_length=12,
                    min_length=4, rng=jax.random.PRNGKey(1))
    b = cap.caption(params, images, use_nucleus_sampling=True, max_length=12,
                    min_length=4, rng=jax.random.PRNGKey(1))
    assert a == b  # same rng -> same captions


def test_prompt_ids_bos_swap_and_sep_drop(tiny_captioner):
    cap, _ = tiny_captioner
    ids = cap.prompt_ids(3)
    assert ids.shape[0] == 3
    assert (ids[:, 0] == cap.tokenizer.dec_token_id).all()
    assert cap.tokenizer.sep_id not in ids[0]


def test_convert_blip_caption_schema(tiny_captioner):
    torch = pytest.importorskip("torch")
    from spn4cir_tpu.models.convert import convert_blip_caption

    cap, params = tiny_captioner
    vc, mc = cap.vit_cfg, cap.med_cfg

    # synthesize a LAVIS blip_caption state dict at tiny geometry
    rng = np.random.RandomState(0)
    sd = {}

    def add(key, *shape):
        sd[key] = torch.tensor(rng.randn(*shape).astype(np.float32))

    pre = "visual_encoder"
    add(f"{pre}.cls_token", 1, 1, vc.width)
    add(f"{pre}.pos_embed", 1, vc.num_tokens, vc.width)
    add(f"{pre}.patch_embed.proj.weight", vc.width, 3, vc.patch_size, vc.patch_size)
    add(f"{pre}.patch_embed.proj.bias", vc.width)
    for i in range(vc.layers):
        b = f"{pre}.blocks.{i}"
        add(f"{b}.norm1.weight", vc.width); add(f"{b}.norm1.bias", vc.width)
        add(f"{b}.attn.qkv.weight", 3 * vc.width, vc.width)
        add(f"{b}.attn.qkv.bias", 3 * vc.width)
        add(f"{b}.attn.proj.weight", vc.width, vc.width)
        add(f"{b}.attn.proj.bias", vc.width)
        add(f"{b}.norm2.weight", vc.width); add(f"{b}.norm2.bias", vc.width)
        add(f"{b}.mlp.fc1.weight", 4 * vc.width, vc.width)
        add(f"{b}.mlp.fc1.bias", 4 * vc.width)
        add(f"{b}.mlp.fc2.weight", vc.width, 4 * vc.width)
        add(f"{b}.mlp.fc2.bias", vc.width)
    add(f"{pre}.norm.weight", vc.width); add(f"{pre}.norm.bias", vc.width)

    dec = "text_decoder"
    add(f"{dec}.bert.embeddings.word_embeddings.weight", mc.vocab_size, mc.hidden_size)
    add(f"{dec}.bert.embeddings.position_embeddings.weight",
        mc.max_position_embeddings, mc.hidden_size)
    add(f"{dec}.bert.embeddings.LayerNorm.weight", mc.hidden_size)
    add(f"{dec}.bert.embeddings.LayerNorm.bias", mc.hidden_size)
    for i in range(mc.num_layers):
        b = f"{dec}.bert.encoder.layer.{i}"
        for q in ("attention", "crossattention"):
            kvw = mc.hidden_size if q == "attention" else mc.encoder_width
            add(f"{b}.{q}.self.query.weight", mc.hidden_size, mc.hidden_size)
            add(f"{b}.{q}.self.query.bias", mc.hidden_size)
            add(f"{b}.{q}.self.key.weight", mc.hidden_size, kvw)
            add(f"{b}.{q}.self.key.bias", mc.hidden_size)
            add(f"{b}.{q}.self.value.weight", mc.hidden_size, kvw)
            add(f"{b}.{q}.self.value.bias", mc.hidden_size)
            add(f"{b}.{q}.output.dense.weight", mc.hidden_size, mc.hidden_size)
            add(f"{b}.{q}.output.dense.bias", mc.hidden_size)
            add(f"{b}.{q}.output.LayerNorm.weight", mc.hidden_size)
            add(f"{b}.{q}.output.LayerNorm.bias", mc.hidden_size)
        add(f"{b}.intermediate.dense.weight", mc.intermediate_size, mc.hidden_size)
        add(f"{b}.intermediate.dense.bias", mc.intermediate_size)
        add(f"{b}.output.dense.weight", mc.hidden_size, mc.intermediate_size)
        add(f"{b}.output.dense.bias", mc.hidden_size)
        add(f"{b}.output.LayerNorm.weight", mc.hidden_size)
        add(f"{b}.output.LayerNorm.bias", mc.hidden_size)
    add(f"{dec}.cls.predictions.transform.dense.weight", mc.hidden_size, mc.hidden_size)
    add(f"{dec}.cls.predictions.transform.dense.bias", mc.hidden_size)
    add(f"{dec}.cls.predictions.transform.LayerNorm.weight", mc.hidden_size)
    add(f"{dec}.cls.predictions.transform.LayerNorm.bias", mc.hidden_size)
    add(f"{dec}.cls.predictions.decoder.weight", mc.vocab_size, mc.hidden_size)
    add(f"{dec}.cls.predictions.bias", mc.vocab_size)

    converted = convert_blip_caption(sd, vc.layers, mc.num_layers)
    want = jax.tree_util.tree_structure(params)
    got = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, converted))
    assert want == got
    # shapes line up too -> the converted tree is directly usable
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.shape(a), np.shape(b)),
        params, converted)


def test_tokenizer_decode_matches_hf(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = tiny_test_vocab()
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    hf = transformers.BertTokenizer(str(vocab_file))
    ours = BertTokenizer(vocab=vocab, add_blip_tokens=False)
    text = "a red dress with long sleeves"
    ids = [ours.cls_id] + ours.encode(text) + [ours.sep_id]
    assert hf.decode(ids, skip_special_tokens=True) == ours.decode(ids)
    # wordpiece merge + punctuation cleanup
    ids2 = ours.encode("making it short.")
    assert hf.decode(ids2, skip_special_tokens=True) == ours.decode(ids2)
