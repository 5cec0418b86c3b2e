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
