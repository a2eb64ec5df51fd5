"""CLI-level integration: the reference's flagship recipes exercised against
synthetic fixtures with the tiny CLIP config (SURVEY.md §3.1-3.3 flows)."""

import json
import os

import pytest

from spn4cir_tpu.cli.submission import submission_main
from spn4cir_tpu.cli.train import train_main
from spn4cir_tpu.cli.validate import validate_main
from tests.fixtures import make_cirr, make_fiq


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    return make_fiq(str(tmp_path_factory.mktemp("fiq")))


@pytest.fixture(scope="module")
def cirr_root(tmp_path_factory):
    return make_cirr(str(tmp_path_factory.mktemp("cirr")))


def test_train_cli_fiq(fiq_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "2",
        "--batch-size", "4",
        "--learning-rate", "1e-3",
        "--plus",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best > 0
    assert os.path.exists(tmp_path / "out" / "best.msgpack")
    assert os.path.exists(tmp_path / "out" / "fiq_bank.npz")


def test_train_cli_int8_bank(fiq_root, tmp_path, monkeypatch):
    """--bank_dtype int8: quantized full-bank stage-2 end-to-end."""
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--learning-rate", "1e-3",
        "--bank_dtype", "int8",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out_q8"),
    ])
    assert best > 0
    assert os.path.exists(tmp_path / "out_q8" / "best.msgpack")


def test_train_cli_clip_dropout_ignored(fiq_root, tmp_path, monkeypatch):
    """--dropout on a CLIP backbone warns and is ignored — it must not feed
    a dropout_rng into a stage2_loss that has no such parameter."""
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--learning-rate", "1e-3",
        "--dropout", "0.1",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out_drop"),
    ])
    assert best > 0


def test_train_cli_cirr_with_neg_num(cirr_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "cirr",
        "--data_path", cirr_root,
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--neg_num", "3",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_validate_cli(fiq_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    results = validate_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
    ])
    assert "mean_recall" in results


def test_submission_cli(cirr_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p1, p2 = submission_main("clip", [
        "--dataset", "cirr",
        "--data_path", cirr_root,
        "--clip-model-name", "test-tiny",
        "--submission-name", "testrun",
    ])
    with open(p1) as f:
        sub = json.load(f)
    assert sub["version"] == "rc2" and sub["metric"] == "recall"
    # 5 test1 queries + 2 schema keys
    assert len(sub) == 7
    pred_lists = [v for k, v in sub.items() if k not in ("version", "metric")]
    # tiny gallery (14 images): top-50 truncates to gallery-1 (ref excluded)
    assert all(len(v) <= 50 for v in pred_lists)
    with open(p2) as f:
        gsub = json.load(f)
    assert gsub["metric"] == "recall_subset"
    glists = [v for k, v in gsub.items() if k not in ("version", "metric")]
    assert all(len(v) == 3 for v in glists)
    # subset predictions never contain the reference image
    rel = json.load(open(os.path.join(cirr_root, "cirr/captions/cap.rc2.test1.json")))
    by_pair = {str(r["pairid"]): r for r in rel}
    for pid, names in gsub.items():
        if pid in ("version", "metric"):
            continue
        assert by_pair[pid]["reference"] not in names
        assert set(names) <= set(by_pair[pid]["img_set"]["members"])


def test_train_cli_mesh(fiq_root, tmp_path, monkeypatch):
    """Multi-chip stage-2 training via --mesh_data/--mesh_bank on the
    8-device virtual CPU mesh."""
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--mesh_data", "4",
        "--mesh_bank", "2",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_validate_cli_other_backbones(fiq_root, cirr_root, tmp_path, monkeypatch):
    """The shared CLI drives every backbone (tiny configs)."""
    monkeypatch.chdir(tmp_path)
    r = validate_main("tgcir", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny"])
    assert "mean_recall" in r
    r = validate_main("blip", [
        "--dataset", "cirr", "--data_path", cirr_root,
        "--clip-model-name", "test-tiny"])
    assert "arithmetic_mean" in r
    r = validate_main("blip2", [
        "--dataset", "cirr", "--data_path", cirr_root,
        "--clip-model-name", "test-tiny"])
    assert "arithmetic_mean" in r


def test_train_cli_resume(fiq_root, tmp_path, monkeypatch):
    """--resume checkpoints full state per epoch and restores it."""
    monkeypatch.chdir(tmp_path)
    argv = [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--batch-size", "4", "--loss_impl", "xla", "--resume",
        "--output_path", str(tmp_path / "out"),
    ]
    train_main("clip", argv + ["--num-epochs", "1"])
    assert os.path.exists(tmp_path / "out" / "resume")
    # second invocation resumes at epoch 1 and continues to 2
    train_main("clip", argv + ["--num-epochs", "2"])


def test_train_cli_blip2(fiq_root, tmp_path, monkeypatch):
    """blip2 train path: caption-aware fusion banks + max-query loss."""
    monkeypatch.chdir(tmp_path)
    best = train_main("blip2", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0
    assert os.path.exists(tmp_path / "out" / "fiq_bank.npz")


def test_train_cli_blip2_mesh(fiq_root, tmp_path, monkeypatch):
    """blip2 + mesh: the max-over-query loss runs bank-sharded
    (sharded_max_query_infonce wired into the sharded step)."""
    monkeypatch.chdir(tmp_path)
    best = train_main("blip2", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--mesh_data", "4", "--mesh_bank", "2",
        "--output_path", str(tmp_path / "out_mesh2"),
    ])
    assert best >= 0


def test_train_cli_blip2_three_axis_int8(fiq_root, tmp_path, monkeypatch):
    """blip2 on the full (data, bank, model) mesh with an int8 3-D fusion
    bank: TP tower + bank-sharded quantized loss in one step (the int8
    restrictions are lifted — VERDICT round-3 item #3)."""
    monkeypatch.chdir(tmp_path)
    best = train_main("blip2", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--mesh_data", "2", "--mesh_bank", "2", "--mesh_model", "2",
        "--bank_dtype", "int8",
        "--output_path", str(tmp_path / "out_mesh3"),
    ])
    assert best >= 0


def test_train_cli_mesh_model_extraction(fiq_root, tmp_path, monkeypatch):
    """--mesh_model tensor-shards the frozen tower during bank extraction."""
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--mesh_model", "4", "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out_tpx"),
    ])
    assert best > 0


def test_train_cli_tgcir(fiq_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best = train_main("tgcir", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_train_cli_bf16_bank(fiq_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--bank_dtype", "bfloat16", "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_train_cli_blip2_mesh_dropout(fiq_root, tmp_path, monkeypatch):
    """--dropout now composes with the mesh for MED-family backbones: the
    sharded step carries a replicated per-step dropout key (train-mode
    Q-Former dropout, the reference's stage-2 regularization regime)."""
    monkeypatch.chdir(tmp_path)
    best = train_main("blip2", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--mesh_data", "4", "--mesh_bank", "2", "--dropout", "0.1",
        "--output_path", str(tmp_path / "out_mesh_drop"),
    ])
    assert best >= 0


def test_zs_trains_on_generated_triplets_only(tmp_path, monkeypatch):
    """zscir quirk: the generated triplets REPLACE the human train set
    (zero-shot — zscir/data_utils.py:151-157 assigns, no --plus gate),
    unlike clip4cir's append. Also proves the zs CLI trains end-to-end
    without --plus, exactly as the reference README recipes run it."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform

    monkeypatch.chdir(tmp_path)
    root = make_fiq(str(tmp_path / "fiq"), extend_suffix="zs")
    tf = ImageTransform("targetpad", 32)
    human = CIRDataset("fiq", "train", "relative", tf, root, ["dress"])
    ds = CIRDataset("fiq", "train", "relative", tf, root, ["dress"],
                    extend_suffix="zs", replace_extended=True)
    with open(os.path.join(root, "captions",
                           "cap.extend_zs.train.json")) as f:
        generated = json.load(f)
    assert len(ds) == len(generated)  # human triplets gone
    assert len(human) > 0 and len(ds) != len(human) + len(generated)
    # fiq randomized two-caption combination applies to generated captions
    assert ds.N == len(generated)

    best = train_main("zs", [
        "--dataset", "fiq",
        "--data_path", root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--learning-rate", "1e-3",
        "--loss_impl", "xla",
        "--output_path", str(tmp_path / "out_zs"),
    ])
    assert best > 0


def test_zs_missing_generated_data_errors_helpfully(tmp_path):
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    with pytest.raises(FileNotFoundError, match="GENERATED triplets"):
        CIRDataset("fiq", "train", "relative", ImageTransform("targetpad", 32),
                   root, ["dress"], extend_suffix="zs", replace_extended=True)


def test_train_cli_stage1_mesh(fiq_root, tmp_path, monkeypatch):
    """--wo_bank (stage-1, live image towers) composes with the mesh:
    data-parallel over 4 devices + TP over 2. Before round 3 this silently
    trained single-device."""
    monkeypatch.chdir(tmp_path)
    best = train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--num-epochs", "1",
        "--batch-size", "4",
        "--wo_bank",
        "--mesh_data", "4", "--mesh_model", "2",
        "--output_path", str(tmp_path / "out"),
    ])
    assert best >= 0


def test_train_cli_stage1_mesh_bank_refused(fiq_root, tmp_path, monkeypatch):
    """Stage-1 has no bank axis; --mesh_bank must fail loudly, not silently
    misconfigure the mesh."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="no bank axis"):
        train_main("clip", [
            "--dataset", "fiq", "--data_path", fiq_root,
            "--dress_types", "dress", "--clip-model-name", "test-tiny",
            "--num-epochs", "1", "--batch-size", "4",
            "--wo_bank", "--mesh_bank", "2",
            "--output_path", str(tmp_path / "out"),
        ])


def test_train_cli_resume_mesh(fiq_root, tmp_path, monkeypatch):
    """--resume composes with the mesh: the orbax restore host-gathers the
    sharded state and the jitted step re-places it per its in_shardings.
    Covers both the stage-2 (data, bank) and stage-1 (data, model) meshes."""
    monkeypatch.chdir(tmp_path)
    argv = [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--batch-size", "4", "--resume",
        "--mesh_data", "4", "--mesh_bank", "2",
        "--output_path", str(tmp_path / "out2"),
    ]
    train_main("clip", argv + ["--num-epochs", "1"])
    assert os.path.exists(tmp_path / "out2" / "resume")
    train_main("clip", argv + ["--num-epochs", "2"])

    argv1 = [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--batch-size", "4", "--resume", "--wo_bank",
        "--mesh_data", "4", "--mesh_model", "2",
        "--output_path", str(tmp_path / "out1"),
    ]
    train_main("clip", argv1 + ["--num-epochs", "1"])
    train_main("clip", argv1 + ["--num-epochs", "2"])


def test_validate_cli_device_preprocess(fiq_root, tmp_path, monkeypatch):
    """--device_preprocess: gallery indexing stages raw canvases and runs
    resize/crop/normalize fused with the tower; Recall metrics must match
    the all-host pipeline on the fixture (identical ranks at this scale)."""
    monkeypatch.chdir(tmp_path)
    argv = [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
    ]
    host = validate_main("clip", argv)
    dev = validate_main("clip", argv + ["--device_preprocess"])
    assert host == dev, (host, dev)


def test_train_cli_stage1_device_preprocess(fiq_root, tmp_path, monkeypatch):
    """--wo_bank (stage-1) + --device_preprocess: the train step absorbs the
    RawBatch canvases on-chip."""
    monkeypatch.chdir(tmp_path)
    from spn4cir_tpu.cli.train import train_main

    train_main("clip", [
        "--dataset", "fiq",
        "--data_path", fiq_root,
        "--dress_types", "dress",
        "--clip-model-name", "test-tiny",
        "--batch-size", "4",
        "--num-epochs", "1",
        "--wo_bank",
        "--device_preprocess",
        "--output_path", str(tmp_path / "out_devpre"),
        "--validation-frequency", "1",
    ])


def test_train_cli_blip2_device_preprocess(fiq_root, tmp_path, monkeypatch):
    """blip2 + --device_preprocess: the caption-aware fusion-bank extraction
    absorbs RawBatch canvases (extract_fusion_banks passes the pytree into
    the absorbed encoder)."""
    monkeypatch.chdir(tmp_path)
    best = train_main("blip2", [
        "--dataset", "fiq", "--data_path", fiq_root,
        "--dress_types", "dress", "--clip-model-name", "test-tiny",
        "--num-epochs", "1", "--batch-size", "4",
        "--loss_impl", "xla",
        "--device_preprocess",
        "--output_path", str(tmp_path / "out_devpre_b2"),
    ])
    assert best >= 0
