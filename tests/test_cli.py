"""CLI smoke tests: all three experiment families end-to-end from main()."""

import os

import pytest


@pytest.fixture(scope="module")
def synth32(tmp_path_factory):
    from lctvqa.data.synthetic import make_dataset
    d = tmp_path_factory.mktemp("cli_synth")
    make_dataset(str(d), num_images=8, num_questions=16, img_size=32,
                 n_answers=16)
    return str(d)


def _run(synth32, tmp_path, *extra):
    from lctvqa.main import main
    main(["--input_dir", synth32, "--tiny", "--img_size", "32",
          "--batch_size", "8", "--num_epochs", "1",
          "--arch_update_freq", "4", "--compute_dtype", "float32",
          *extra])


def test_cli_lct_and_eval(synth32, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_lct", "--skip_stage3")
    assert os.path.exists(tmp_path / "experiment_data/cli_lct/ef_model.ckpt")
    # eval CLI on the produced checkpoint (model-eval.ipynb equivalent);
    # model dims come from the config embedded in the checkpoint — no
    # dim-replication flags needed
    import lctvqa.eval as ev
    ev.main(["--exp", "cli_lct", "--input_dir", synth32,
             "--root_stats_dir", str(tmp_path / "experiment_data"),
             "--batch_size", "8", "--num_batches", "1"])


def test_cli_darts(synth32, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_darts", "--package", "darts")
    assert os.path.exists(
        tmp_path / "experiment_data/cli_darts/vqa_model.ckpt")


def test_cli_unified(synth32, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_unified", "--package", "unified")
    assert os.path.exists(
        tmp_path / "experiment_data/cli_unified/vqa_model.ckpt")


def test_cli_derived(synth32, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_derived", "--package", "darts",
         "--arch_type", "derived", "--genotype", "PC_DARTS_cifar")


def test_cli_eval_int8(synth32, tmp_path, monkeypatch):
    """LCT train with a derived encoder, then serve the checkpoint int8
    from the eval CLI (quantize_model dispatch; lctvqa/quant.py)."""
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_int8", "--skip_stage3",
         "--arch_type", "derived", "--genotype", "PC_DARTS_cifar")
    import lctvqa.eval as ev
    ev.main(["--exp", "cli_int8", "--input_dir", synth32,
             "--root_stats_dir", str(tmp_path / "experiment_data"),
             "--batch_size", "8", "--num_batches", "1", "--int8"])


def test_cli_eval_tp(synth32, tmp_path, monkeypatch):
    """Serve a trained checkpoint over a 2x4 (data x model) mesh from the
    eval CLI (--tp): the VGG classifier runs megatron-split
    (parallel/tp.py) on the 8 virtual CPU devices."""
    monkeypatch.chdir(tmp_path)
    _run(synth32, tmp_path, "--exp", "cli_tp", "--skip_stage3",
         "--arch_type", "fixed")
    import lctvqa.eval as ev
    ev.main(["--exp", "cli_tp", "--input_dir", synth32,
             "--root_stats_dir", str(tmp_path / "experiment_data"),
             "--batch_size", "8", "--num_batches", "1", "--tp", "4"])


def test_cli_defaults_match_config_defaults():
    """argparse defaults must not drift from the Config dataclass
    defaults (caught live in round 3: --architect_mode kept 'exact'
    after the config default moved to 'exact-indirect'). A default-free
    CLI invocation must produce exactly the dataclass defaults for every
    shared hyperparameter."""
    from lctvqa.config import DataConfig, ModelConfig, TrainConfig
    from lctvqa.main import build_parser

    args = build_parser().parse_args(
        ["--input_dir", "/nonexistent", "--exp", "x"])
    t, m, d = TrainConfig(), ModelConfig(), DataConfig()
    expected = {
        "batch_size": t.batch_size, "num_epochs": t.num_epochs,
        "learning_rate": t.learning_rate, "step_size": t.step_size,
        "lr_decay": t.lr_decay, "arch_learning_rate": t.arch_learning_rate,
        "arch_update_freq": t.arch_update_freq, "w_lambda": t.w_lambda,
        "train_portion": t.train_portion, "seed": t.seed,
        "architect_mode": t.architect_mode,
        "stage3_remat": t.stage3_remat,
        "packed_dispatch": getattr(args, "packed_dispatch",
                                   t.packed_dispatch),
        "img_size": m.img_size, "compute_dtype": m.compute_dtype,
        "pallas_generate": m.pallas_generate,
        "pallas_seq_lstm": m.pallas_seq_lstm,
        "num_workers": d.num_workers, "max_num_ans": d.max_num_ans,
    }
    for name, want in expected.items():
        if not hasattr(args, name):
            continue
        got = getattr(args, name)
        assert got == want, (
            f"CLI default --{name}={got!r} drifted from config "
            f"default {want!r}")
