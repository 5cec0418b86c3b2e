"""2-stage DARTS experiment + unified variant, end-to-end on the synthetic
npy dataset (reference darts_vqa/experiment.py, exp_unified.py)."""

import os

import numpy as np
import pytest

from lctvqa.config import (Config, DataConfig, MeshConfig, ModelConfig,
                           TrainConfig)
from lctvqa.text import VocabDict


def _cfg(synth_dir, tmp_path, name):
    qv = VocabDict(os.path.join(synth_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(synth_dir, "vocab_answers.txt"))
    model = ModelConfig(
        img_embed_size=32, word_embed_size=16, lstm_hidden_size=32,
        max_qst_len=12, qst_vocab_size=qv.vocab_size,
        ans_vocab_size=av.vocab_size, img_size=16, darts_init_ch=4,
        darts_layers=2, compute_dtype="float32", vgg_width_mult=0.125,
        vgg_fc_dim=64)
    train = TrainConfig(batch_size=8, num_epochs=1, arch_update_freq=2,
                        report_freq=1)
    return Config(model=model, train=train,
                  data=DataConfig(input_dir=synth_dir),
                  exp_name=name, root_stats_dir=str(tmp_path))


def test_npy_dataset_v1_semantics(synth_dir):
    from lctvqa.data import pipeline_npy
    ds = pipeline_npy.VqaNpyDataset(synth_dir, "train.npy",
                                    max_qst_length=12, img_size=16)
    rng = np.random.default_rng(0)
    item = ds.item(0, rng)
    q = item["question"]
    assert q.shape == (12,)
    assert q[0] == ds.qst_vocab.word2idx("<start>")
    toks = ds.vqa[0]["question_tokens"]
    assert q[len(toks) + 1] == ds.qst_vocab.word2idx("<end>")
    assert (q[len(toks) + 2:] == ds.qst_vocab.word2idx("<pad>")).all()
    assert item["image_u8"].shape == (16, 16, 3)
    mc = item["answer_multi_choice"]
    assert item["answer_label"] in mc[mc >= 0]


def test_npy_dataset_unified_stream(synth_dir):
    from lctvqa.data import pipeline_npy
    ds = pipeline_npy.VqaNpyDatasetUnified(synth_dir, "train.npy",
                                           max_qst_length=12, img_size=16)
    rng = np.random.default_rng(0)
    item = ds.item(0, rng)
    qa = item["qa_str"]
    v = ds.unified_vocab
    assert qa[0] == v.word2idx("<start>")
    words = [v.idx2word(int(i)) for i in qa]
    assert "<sep>" in words and "<end>" in words
    assert words.index("<sep>") < words.index("<end>")


def test_darts_experiment_one_epoch(synth_dir, tmp_path):
    from lctvqa.train.experiment_darts import DartsExperiment
    exp = DartsExperiment(_cfg(synth_dir, tmp_path, "darts_exp"))
    exp.run()
    assert len(exp.train_loss) == 1 and np.isfinite(exp.train_loss[0])
    assert len(exp.val_b4) == 1
    for f in ("vqa_model.ckpt", "arch_par.ckpt", "stats.ckpt"):
        assert os.path.exists(os.path.join(exp.exp_dir, f))


def test_darts_experiment_resume_and_guard(synth_dir, tmp_path):
    """Resume restores epoch/params/arch/stats (darts_vqa/experiment.py:
    91-103); a fresh run into a non-empty dir errors out."""
    import dataclasses

    from lctvqa.train.experiment_darts import DartsExperiment
    cfg = _cfg(synth_dir, tmp_path, "darts_resume")
    exp = DartsExperiment(cfg)
    exp.run()

    cfg2 = dataclasses.replace(cfg, resume=True)
    exp2 = DartsExperiment(cfg2)
    assert exp2.current_epoch == 1          # continues from saved epoch
    assert exp2.train_loss == exp.train_loss  # stats restored
    np.testing.assert_allclose(
        np.asarray(exp2.arch["alphas_normal"]),
        np.asarray(exp.arch["alphas_normal"]))
    leaves1 = np.concatenate([np.ravel(x) for x in __import__(
        "jax").tree_util.tree_leaves(exp.params)])
    leaves2 = np.concatenate([np.ravel(x) for x in __import__(
        "jax").tree_util.tree_leaves(exp2.params)])
    np.testing.assert_allclose(leaves1, leaves2)

    # guard: same dir without resume must raise
    with pytest.raises(RuntimeError, match="not empty"):
        DartsExperiment(cfg)

    # checkpoints are self-describing
    from lctvqa.train import checkpoint
    saved_cfg = checkpoint.load_config(
        os.path.join(exp.exp_dir, "vqa_model.ckpt"))
    # the embedded config is the model AS RUN (the >1-device mesh guard
    # rewrites single-chip-only Pallas execution flags, experiment_darts
    # __init__), so compare against the experiment's effective config
    assert saved_cfg is not None and saved_cfg.model == exp.cfg.model


def test_unified_experiment_one_epoch(synth_dir, tmp_path):
    from lctvqa.train.experiment_darts import DartsExperimentUnified
    exp = DartsExperimentUnified(_cfg(synth_dir, tmp_path, "unified_exp"))
    exp.run()
    assert len(exp.train_loss) == 1 and np.isfinite(exp.train_loss[0])
    assert len(exp.val_acc) == 1
    assert 0.0 <= exp.val_acc[0] <= 1.0


def test_qst_only_mode(synth_dir, tmp_path):
    """qst_only drops the answer CE (darts_vqa/vqa_model.py:351-364): the
    answer head gets zero gradient."""
    import jax
    import jax.numpy as jnp

    from lctvqa.models import vqa_ef
    cfg = _cfg(synth_dir, tmp_path, "qst_only").model
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    qst = jax.random.randint(key, (2, cfg.max_qst_len), 0,
                             cfg.qst_vocab_size)
    labels = jax.random.randint(key, (2,), 0, cfg.ans_vocab_size)
    params, arch = vqa_ef.init_ef_model(key, cfg)
    grads = jax.jit(jax.grad(lambda p: vqa_ef.ef_loss(
        p, arch, cfg, img, qst, labels, qst_only=True)))(params)
    # answer head fc1/fc2 unused when qst_only (the reference's
    # exp_zero_grad=6 invariant, architect_vqa.py:123-145: fc1.w, fc1.b,
    # fc2.w, fc2.b + img_fc has grads via qst path... check heads only)
    for head in ("fc1", "fc2"):
        s = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads[head]))
        assert s == 0.0, head
