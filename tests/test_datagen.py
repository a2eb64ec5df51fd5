"""Positive-generation pipeline tests (ref zscir/deduplicate_images.py,
srm_utils.py, get_cir_data.py semantics)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.datagen.captioner import (
    caption_images,
    caption_prompt,
    stub_captioner,
    write_it_list,
)
from spn4cir_tpu.datagen.dedup import (
    build_optimized_images,
    deduplicate,
    find_duplicate_groups,
)
from spn4cir_tpu.datagen.generate import (
    generate_extended_triplets,
    load_it_list,
    sample_partners,
    write_extended_triplets,
)
from spn4cir_tpu.datagen.llm_rewrite import build_rewrite_prompt, make_llm_rewriter
from spn4cir_tpu.datagen.srm import compute_sims, srm_scores
from spn4cir_tpu.datagen.templates import get_captions
from tests.fixtures import make_fiq, make_cirr

TF = ImageTransform("targetpad", 32)


# ---- dedup ----

def test_dedup_groups_and_map(tmp_path, rng):
    root = str(tmp_path)
    arrs = [rng.randint(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)]
    paths, names = [], []
    for i, which in enumerate([0, 1, 0, 2, 1]):  # imgs 0/2 dup, 1/4 dup
        p = os.path.join(root, f"im{i}.png")
        Image.fromarray(arrs[which]).save(p)
        paths.append(p)
        names.append(f"im{i}")
    groups = find_duplicate_groups(names, paths)
    assert sorted(map(sorted, groups)) == [["im0", "im2"], ["im1", "im4"]]
    out_names, out_paths, name2id = build_optimized_images(names, paths, groups)
    assert out_names == ["im0", "im1", "im3"]
    assert name2id["im2"] == name2id["im0"] == 0
    assert name2id["im4"] == name2id["im1"] == 1
    assert name2id["im3"] == 2


def test_dedup_to_dataset_roundtrip(tmp_path):
    root = make_fiq(str(tmp_path / "fiq"))
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    out = deduplicate(ds, root)
    assert os.path.exists(out)
    ds2 = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    # fixture has no duplicates -> identical maps
    assert ds2.imagename2id == ds.imagename2id


# ---- templates ----

def test_templates():
    caps = get_captions("a red dress", "a blue gown", prompt_ids=(0, 1, 2))
    assert caps[0] == "a blue gown instead of a red dress"
    assert caps[1] == "Unlike a red dress, I want a blue gown"
    assert caps[2] == "a blue gown"


def test_template_overflow_fallback():
    long1 = "very " * 120 + "long caption"
    caps = get_captions(long1, "short target", prompt_ids=(0,))
    assert caps == ["short target"]


# ---- srm ----

def test_srm_scores_match_loop_oracle(rng):
    n_img, n_tri, d = 12, 6, 8
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    clip_img = norm(rng.randn(n_img, d)).astype(np.float32)
    clip_txt = norm(rng.randn(n_tri, d)).astype(np.float32)
    srm_img = norm(rng.randn(n_img, d)).astype(np.float32)
    srm_txt = norm(rng.randn(n_tri, d)).astype(np.float32)
    sims = compute_sims(clip_img, clip_txt, srm_img, srm_txt)
    refer = rng.randint(0, n_img, n_tri)
    target = (refer + 1) % n_img
    out = srm_scores(sims, refer, target, k_negatives=5)

    # oracle: reference's argsort-position loop (srm_utils.py:142-170)
    for i in range(n_tri):
        r, t = refer[i], target[i]
        i2i_order = np.argsort(-sims["i2i"][r])
        r2t = int(np.where(i2i_order == t)[0][0])
        i2i_order_t = np.argsort(-sims["i2i"][t])
        t2r = int(np.where(i2i_order_t == r)[0][0])
        assert out["rt"][i] == r2t + t2r
    # negatives exclude self and are similarity-sorted
    for i in range(n_tri):
        negs = out["t_fn"][i]
        assert target[i] not in negs
        vals = sims["i2i"][target[i]][negs]
        assert (np.diff(vals) <= 1e-6).all()


# ---- generation ----

def test_sample_partners_window(rng):
    import random as pyrandom

    ranks = np.argsort(-rng.randn(10, 10), axis=1)
    r = pyrandom.Random(0)
    picks = sample_partners(2, 10, 3, r, i2i_ranks=ranks, rank_lo=1, rank_hi=6)
    assert len(picks) == 3
    assert set(picks) <= set(ranks[2][1:6].tolist())
    uni = sample_partners(2, 10, 3, r)
    assert 2 not in uni


def test_generate_and_consume_fiq(tmp_path):
    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    name2cap = {n: f"caption of {n}" for n in ds.imagenames}
    triplets = generate_extended_triplets(ds, name2cap, k=2, seed=0,
                                          prompt_ids=(0, 2))
    assert len(triplets) == 2 * ds.num_unique_images
    assert {"candidate", "target", "captions", "caption1", "caption2"} <= set(triplets[0])
    path = write_extended_triplets(ds, triplets, "clip")
    assert path.endswith("cap.extend_clip.train.json")
    # dataset consumes the generated file via --plus
    ds_plus = CIRDataset("fiq", "train", "relative", TF, root, ["dress"], plus=True)
    assert len(ds_plus) == len(ds.triplets) + len(triplets)


def test_generate_cirr_schema_and_llm(tmp_path):
    root = make_cirr(str(tmp_path / "cirr"), extended=False)
    ds = CIRDataset("cirr", "train", "relative", TF, root)
    name2cap = {n: f"cap {n}" for n in ds.imagenames}
    rewriter = make_llm_rewriter(lambda prompt: "fake rewrite\nextra", "cirr")
    triplets = generate_extended_triplets(ds, name2cap, k=1, seed=0,
                                          llm_rewrite=rewriter)
    t = triplets[0]
    assert t["pairid"] == 0 and t["img_set"]["members"] == ["xxx"]
    assert t["llm_caption"] == "fake rewrite"
    path = write_extended_triplets(ds, triplets, "zs", llm=True)
    assert path.endswith("cap.rc2.train.extend_zs_llm.json")
    ds_plus = CIRDataset("cirr", "train", "relative", TF, root, plus=True,
                         llmcap=True, extend_suffix="zs")
    assert ds_plus.triplets[-1]["captions"] == ["fake rewrite"]


def test_refer_only_filter(tmp_path):
    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    name2cap = {n: "c" for n in ds.imagenames}
    refs = {t["reference_name"] for t in ds.triplets}
    triplets = generate_extended_triplets(ds, name2cap, k=1, refer_only=True, seed=0)
    assert {t["candidate"] for t in triplets} <= refs


# ---- captioner ----

def test_captioner_pipeline(tmp_path, rng):
    imgs = [(f"im{i}", rng.rand(8, 8, 3).astype(np.float32)) for i in range(3)]
    it_list = caption_images(imgs, stub_captioner, category="dress", num_words=8)
    assert len(it_list) == 3
    assert all("caption" in it and "image_id" in it for it in it_list)
    assert "dress" in caption_prompt("dress", 8)
    path = write_it_list(it_list, "fiq", "stub", 8, out_root=str(tmp_path / "mm"))
    assert path.endswith("fashioniq_it_stub_8.json")
    loaded = load_it_list(path)
    assert loaded["im0"] == it_list[0]["caption"]


def test_rewrite_prompt_contract():
    # mod_type 0 strips trailing periods and composes "{1} instead of {0}"
    # (ref llama_generate.py:79-84); llm_type 1 wraps in the LLaMA-2 chat
    # few-shot prompt (ref prompt.py:41-73).
    p = build_rewrite_prompt("old cap.", "new cap.", "fiq")
    assert "source caption: new cap instead of old cap\n target caption: [/INST]" in p
    assert p.startswith("<s>[INST] <<SYS>>\n")
    assert p.count("</s>") == 5  # 5 few-shot pairs
    # llm_type 2: plain rewrite template
    p2 = build_rewrite_prompt("a.", "b.", "cirr", llm_type=2)
    assert p2.startswith("Rewrite the sentence")
    assert "sentence:b instead of a\n" in p2


def test_rewrite_prompts_byte_exact_vs_reference():
    ref_prompt = "/root/reference/zscir/prompt.py"
    ref_prompts = "/root/reference/zscir/prompts.py"
    if not (os.path.exists(ref_prompt) and os.path.exists(ref_prompts)):
        pytest.skip("reference not available")
    from spn4cir_tpu.datagen import llm_rewrite as lr

    ns = {}
    exec(open(ref_prompt).read(), ns)  # pure string builders
    for cap in ("a red dress", "b instead of a"):
        assert lr.get_fiq_prompt(cap) == ns["get_fiq_prompt"](cap)
        assert lr.get_cirr_prompt(cap) == ns["get_cirr_prompt"](cap)
    assert lr.PROMPT_TEMPLATES["fiq"] == ns["prompt_templates"]["fiq"]
    assert lr.PROMPT_TEMPLATES["cirr"] == ns["prompt_templates"]["cirr"]
    ns2 = {}
    exec(open(ref_prompts).read(), ns2)
    assert lr.PROMPTS_REFERENCE == ns2["prompts_reference"]
    assert lr.PROMPTS_TARGET == ns2["prompts_target"]
    assert lr.PROMPTS_BOTH == ns2["prompts_both"]


def test_rewrite_post_process():
    from spn4cir_tpu.datagen.llm_rewrite import max_new_tokens_for, post_process

    # ref llama_generate.py:47-52: last ':' segment, first line, stripped
    assert post_process(" new sentence: a nice dress \nextra") == " a nice dress "
    assert post_process("plain output\nsecond") == "plain output"
    assert max_new_tokens_for("fiq") == 25
    assert max_new_tokens_for("cirr") == 50


def test_generate_cc_triplets(tmp_path):
    from spn4cir_tpu.datagen.generate import generate_cc_triplets, write_cc_triplets

    items = [{"image_id": f"http://cc/{i}", "image_path": f"/cc/img{i}.jpg",
              "caption": f"caption {i}"} for i in range(6)]
    trips = generate_cc_triplets(items, "fiq", k=1, seed=0)
    assert len(trips) == 6
    # the reference CC schema: full PATHS in reference/target + names
    # (get_cir_data.py:205-213)
    assert trips[0]["reference"].startswith("/cc/")
    assert trips[0]["reference_name"].startswith("http://cc/")
    assert isinstance(trips[0]["captions"], list)
    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    path = write_cc_triplets(root, "fiq", trips)
    assert path.endswith("cap.cc.train.json")
    path2 = write_cc_triplets(root, "cirr", trips)
    assert path2.endswith("cap.rc2.train.cc.json")
    # dict form still accepted (ids double as paths)
    legacy = generate_cc_triplets({f"cc{i}": f"c {i}" for i in range(4)},
                                  "fiq", k=1, seed=0)
    assert legacy[0]["reference"] == legacy[0]["reference_name"]


def test_zscir_datagen_cli_scripts(tmp_path, monkeypatch):
    """The zscir CLI wrappers run end-to-end on a fixture: dedup ->
    captioner -> get_cir_data (the reference's offline recipe chain)."""
    import subprocess
    import sys

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.join(os.path.dirname(__file__), "..")

    def run(script, *args):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "zscir", script), *args],
            capture_output=True, text=True, env=env, cwd=str(tmp_path),
            timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    run("deduplicate_images.py", "--dataset", "fiq", "--data_path", root,
        "--dress_types", "dress")
    assert os.path.exists(os.path.join(root, "optimized_images.json"))
    run("captioner.py", "--dataset", "fiq", "--data_path", root,
        "--dress_types", "dress", "--word_num", "6")
    it_path = str(tmp_path / "mm_data" / "fiq" / "fashioniq_it_stub_6.json")
    assert os.path.exists(it_path)
    run("get_cir_data.py", "--dataset", "fiq", "--data_path", root,
        "--dress_types", "dress", "--it_list", it_path, "--model", "zs",
        "--k", "1")
    assert os.path.exists(os.path.join(root, "captions",
                                       "cap.extend_zs.train.json"))
    # the generated file feeds --plus training
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"],
                    plus=True, extend_suffix="zs")
    assert len(ds) > ds.N


def test_full_datagen_chain_with_llava_and_jax_rewriter(tmp_path):
    """The whole positive-scaling factory (SURVEY §3.4) on the tiny JAX
    models end to end: LLaVA captions -> it-list JSON -> extended-triplet
    generation with the TPU-native LLaMA rewriter -> consumed back by
    CIRDataset(plus=True, llmcap=True)."""
    import numpy as np
    from PIL import Image

    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.captioner import (caption_images_batched,
                                               make_llava_captioner)
    from spn4cir_tpu.datagen.generate import (generate_extended_triplets,
                                              load_it_list,
                                              write_extended_triplets)
    from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter
    from tests.fixtures import make_cirr

    root = make_cirr(str(tmp_path / "cirr_dataset"), extended=False)
    ds = CIRDataset("cirr", "train", "relative",
                    ImageTransform("targetpad", 28), root)

    # 1. caption with the tiny JAX LLaVA (random weights; contract test)
    _, transform, batched_fn = make_llava_captioner(
        None, llava_size="tiny", max_new_tokens=4, batch_size=4)

    def images():
        for name, path in zip(ds.imagenames, ds.imagepaths):
            yield name, transform(Image.open(path))

    it_list = caption_images_batched(images(), batched_fn, batch_size=4)
    assert len(it_list) == len(ds.imagenames)
    it_path = tmp_path / "it.json"
    import json

    it_path.write_text(json.dumps(it_list))

    # 2. extended triplets with the JAX rewriter
    name2cap = load_it_list(str(it_path))
    rewriter = load_jax_rewriter(tiny=True, data="cirr", seed=0)
    triplets = generate_extended_triplets(ds, name2cap, k=1,
                                          llm_rewrite=rewriter, seed=0)
    assert triplets
    out = write_extended_triplets(ds, triplets, "zs", llm=True)

    # 3. consumed back by the training dataset
    ds2 = CIRDataset("cirr", "train", "relative",
                     ImageTransform("targetpad", 28), root, plus=True,
                     llmcap=True, extend_suffix="zs")
    assert len(ds2.triplets) == len(ds.triplets) + len(triplets)


def test_batch_rewriter_matches_single_path():
    """make_jax_batch_generate_fn (length-sorted, left-padded buckets) must
    reproduce the one-prompt-at-a-time path exactly when sampling is
    deterministic (top_k=1 == argmax), regardless of batch composition or
    bucket padding."""
    import jax
    import jax.numpy as jnp

    from spn4cir_tpu.models.llama import LlamaConfig, LlamaLM
    from spn4cir_tpu.datagen.llm_rewrite import (make_jax_batch_generate_fn,
                                                 make_jax_generate_fn)
    from spn4cir_tpu.tokenizer.bytelevel import ByteTokenizer

    tok = ByteTokenizer()
    cfg = LlamaConfig.tiny(vocab_size=max(tok.vocab_size, 128))
    params = LlamaLM(cfg).init(jax.random.PRNGKey(0),
                               input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
    prompts = ["a red dress", "a much longer caption about a blue gown",
               "shirt", "a striped top with sleeves"]
    single = make_jax_generate_fn(params, cfg, tok, max_new_tokens=6,
                                  top_k=1, seed=0)
    batched = make_jax_batch_generate_fn(params, cfg, tok, max_new_tokens=6,
                                         top_k=1, seed=0, batch_size=3,
                                         len_bucket=8)
    want = [single(p) for p in prompts]
    got = batched(prompts)
    assert got == want, (got, want)

    # batch_size=0: bucket-aware auto batching (DECODE_BUCKET_BATCH) —
    # still order-preserving and identical under deterministic sampling
    auto = make_jax_batch_generate_fn(params, cfg, tok, max_new_tokens=6,
                                      top_k=1, seed=0, batch_size=0,
                                      len_bucket=8)
    assert auto(prompts) == want


def test_bucket_batch_grouping():
    """Auto groups never pad across a DECODE_BUCKET_BATCH bound and respect
    each bucket's batch size."""
    from spn4cir_tpu.datagen import llm_rewrite as lr

    table = ((4, 2, 4), (16, 3, 6), (10 ** 9, 4, 8))
    orig = lr.DECODE_BUCKET_BATCH
    lr.DECODE_BUCKET_BATCH = table
    try:
        import numpy as np

        assert lr.recommended_llm_batch(3) == 2
        assert lr.recommended_llm_batch(5) == 3
        assert lr.recommended_llm_batch(99) == 4
        # int8 KV column; f32 halves the float working point
        assert lr.recommended_llm_batch(5, np.int8) == 6
        assert lr.recommended_llm_batch(99, np.int8) == 8
        assert lr.recommended_llm_batch(5, np.float32) == 1
        assert lr.recommended_llm_batch(99, np.float32) == 2
        import jax
        import jax.numpy as jnp

        from spn4cir_tpu.models.llama import LlamaConfig, LlamaLM
        from spn4cir_tpu.tokenizer.bytelevel import ByteTokenizer

        tok = ByteTokenizer()
        cfg = LlamaConfig.tiny(vocab_size=max(tok.vocab_size, 128))
        params = LlamaLM(cfg).init(
            jax.random.PRNGKey(0),
            input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
        single = lr.make_jax_generate_fn(params, cfg, tok, max_new_tokens=4,
                                         top_k=1, seed=0)
        auto = lr.make_jax_batch_generate_fn(
            params, cfg, tok, max_new_tokens=4, top_k=1, seed=0,
            batch_size=0, len_bucket=4)
        # lengths straddle both bounds: 2-3 tokens (bucket 1), ~8 (bucket
        # 2), ~20+ (bucket 3)
        prompts = ["ab", "cd", "efg", "longer p", "8 tokens",
                   "a very long prompt that lands in bucket three ok"]
        want = [single(p) for p in prompts]
        assert auto(prompts) == want
    finally:
        lr.DECODE_BUCKET_BATCH = orig


def test_generate_triplets_uses_batch_rewriter(tmp_path):
    """generate_extended_triplets routes through .rewrite_batch when the
    rewriter exposes it, attaching llm_caption to every triplet in order."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.generate import generate_extended_triplets
    from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter
    from tests.fixtures import make_cirr

    root = make_cirr(str(tmp_path / "cirr_dataset"), extended=False)
    ds = CIRDataset("cirr", "train", "relative",
                    ImageTransform("targetpad", 28), root)
    name2cap = {n: f"caption of {n}" for n in ds.imagenames}
    rewriter = load_jax_rewriter(tiny=True, data="cirr", seed=0, batch_size=4)
    assert hasattr(rewriter, "rewrite_batch")
    calls = []
    inner = rewriter.rewrite_batch

    def spy(pairs):
        calls.append(len(pairs))
        return inner(pairs)

    rewriter.rewrite_batch = spy
    triplets = generate_extended_triplets(ds, name2cap, k=1,
                                          llm_rewrite=rewriter, seed=0)
    assert triplets and all(
        isinstance(t["llm_caption"], str) and t["llm_caption"]
        for t in triplets)
    assert calls == [len(triplets)]  # one batched call for the whole list


def test_converted_msgpack_rewriter_roundtrip(tmp_path):
    """tools/convert_ckpt.py's llama output (flax msgpack, optionally int8)
    must load back through load_jax_rewriter: QuantKernel leaves round-trip
    as {'values','scales'} dicts and are rebuilt on load."""
    import jax
    import jax.numpy as jnp

    from spn4cir_tpu.datagen.llm_rewrite import load_jax_rewriter
    from spn4cir_tpu.models.convert import (has_quantized_leaves,
                                            is_converted_checkpoint,
                                            load_converted_params,
                                            quantize_llama_weights_host)
    from spn4cir_tpu.models.llama import LlamaConfig, LlamaLM
    from spn4cir_tpu.tokenizer.bytelevel import ByteTokenizer
    from spn4cir_tpu.utils.checkpoint import save_model

    tok = ByteTokenizer()
    cfg = LlamaConfig.tiny(vocab_size=max(int(tok.vocab_size), 128))
    params = LlamaLM(cfg).init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
    params = jax.tree.map(lambda x: np.asarray(x), params)
    qparams = quantize_llama_weights_host(params)
    path = str(tmp_path / "llama_tiny.msgpack")
    save_model(path, {"params": qparams}, extra={"backbone": "llama"})

    assert is_converted_checkpoint(path)
    loaded = load_converted_params(path)["params"]
    assert has_quantized_leaves(loaded)
    lm_head = loaded["lm_head"]
    np.testing.assert_array_equal(lm_head.values, qparams["lm_head"].values)
    np.testing.assert_allclose(lm_head.scales, qparams["lm_head"].scales)

    # end to end: the rewriter loads the msgpack and produces a rewrite
    # (quantize_weights must not double-quantize the already-int8 leaves)
    rewriter = load_jax_rewriter(ckpt_path=path, tiny=True, data="cirr",
                                 seed=0, quantize_weights=True)
    out = rewriter("a red dress", "a blue gown")
    assert isinstance(out, str) and out


def test_cc_datagen_chain(tmp_path, monkeypatch):
    """The README's CC recipe end-to-end: captioner --cir_data cc over a
    part_{id}.data shard (data_process.py get_cc_it contract) ->
    get_cir_data --data ccfiq -> cap.cc.train.json consumed by the zs
    loader with path-carrying triplets."""
    import subprocess
    import sys

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    monkeypatch.chdir(tmp_path)
    # fake CC3M shard: jsonl with url/image/caption.en, images from the
    # fixture (stand-ins for external CC files)
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform

    base = CIRDataset("fiq", "train", "relative",
                      ImageTransform("targetpad", 32), root, ["dress"])
    shard = tmp_path / "part_0.data"
    with open(shard, "w") as f:
        for i, (name, path) in enumerate(
                zip(base.imagenames[:4], base.imagepaths[:4])):
            f.write(json.dumps({"url": f"http://cc/{i}", "image": path,
                                "caption": {"en": f"cc caption {i}"}}) + "\n")
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    r = subprocess.run([sys.executable, os.path.join(repo, "zscir/captioner.py"),
                        "--cir_data", "cc", "--cc_id", "0",
                        "--cc_path", str(tmp_path / "part_{}.data"),
                        "--mllm", "stub", "--k", "5"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    it_path = tmp_path / "mm_data" / "zs" / "cc_it_0_stub_5.json"
    assert it_path.exists()
    with open(it_path) as f:
        entries = json.load(f)
    assert all({"image_id", "image_path", "caption"} <= set(e)
               for e in entries)

    r = subprocess.run([sys.executable,
                        os.path.join(repo, "zscir/get_cir_data.py"),
                        "--data", "ccfiq", "--data_path", root,
                        "--mllm", "stub", "--word_num", "5", "--k", "1"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    cc_file = os.path.join(root, "captions", "cap.cc.train.json")
    assert os.path.exists(cc_file)

    # consumed back by the zs loader: generated-only, paths carried verbatim
    zs = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 32), root, ["dress"],
                    use_cc=True, replace_extended=True)
    assert len(zs) == 4
    assert zs.triplets[0]["reference"] in base.imagepaths[:4]
    assert zs.imagepaths  # id maps resolve through the cc name->path map


def test_caption_resume_checkpoint(tmp_path):
    """Preemption resume: finished batches survive in the jsonl sidecar; a
    rerun seeds from it and never re-captions (the reference restarts its
    hour-plus MLLM jobs from zero)."""
    from spn4cir_tpu.datagen.captioner import (caption_images_batched,
                                               load_caption_checkpoint)

    ckpt = str(tmp_path / "part.jsonl")
    calls = {"n": 0}

    def flaky(images):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("preempted")
        return [f"cap{i}" for i in range(len(images))]

    imgs = [(f"im{i}", np.zeros((2, 2, 3))) for i in range(4)]
    with pytest.raises(RuntimeError):
        caption_images_batched(iter(imgs), flaky, batch_size=2,
                               checkpoint_path=ckpt)
    done = load_caption_checkpoint(ckpt)
    assert set(done) == {"im0", "im1"}

    rest = [(n, im) for n, im in imgs if n not in done]
    out = caption_images_batched(iter(rest), lambda ims: ["x"] * len(ims),
                                 batch_size=2, checkpoint_path=ckpt,
                                 already=done)
    assert {e["image_id"] for e in out} == {"im0", "im1", "im2", "im3"}
    assert len(load_caption_checkpoint(ckpt)) == 4
    # a torn final line (killed mid-write) is tolerated
    with open(ckpt, "a") as f:
        f.write('{"image_id": "bro')
    assert len(load_caption_checkpoint(ckpt)) == 4


def test_captioner_cli_resume_skips_decoding(tmp_path, monkeypatch):
    """A complete sidecar short-circuits the run entirely: the CLI finishes
    even with the image files GONE (proof it never re-decodes)."""
    import subprocess
    import sys

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    monkeypatch.chdir(tmp_path)
    ds = CIRDataset("fiq", "train", "relative", TF, root, ["dress"])
    os.makedirs(tmp_path / "mm_data" / "fiq", exist_ok=True)
    sidecar = tmp_path / "mm_data" / "fiq" / \
        ".fashioniq_it_llava_5.json.nockpt.partial.jsonl"
    with open(sidecar, "w") as f:
        for n in ds.imagenames:
            f.write(json.dumps({"image_id": n, "caption": f"done {n}"}) + "\n")
    for p in ds.imagepaths:
        os.remove(p)
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable,
                        os.path.join(repo, "zscir/captioner_llava.py"),
                        "--cir_data", "fiq", "--data_path", root,
                        "--dress_types", "dress", "--llava_size", "tiny",
                        "--batch_size", "2", "--k", "5"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming" in r.stdout
    with open(tmp_path / "mm_data" / "fiq" /
              "fashioniq_it_llava_5.json") as f:
        out = json.load(f)
    assert {e["image_id"]: e["caption"] for e in out} == {
        n: f"done {n}" for n in ds.imagenames}
