"""AOT serving export (lctvqa/export.py).

Contract: an exported artifact — serialized StableHLO + host param tree —
reproduces the direct model apply bit-for-tolerance, at MULTIPLE batch
sizes from ONE export (the batch dim is symbolic), and the CLI round-trips
a real checkpoint from disk. The reference has no serving path
(inference lives in `basic_vqa/model-eval.ipynb`); this is TPU-native
capability beyond parity.
"""

import dataclasses
import os
import pickle

import jax
import numpy as np
import pytest

from lctvqa import export as exp_mod
from lctvqa.models import vqa_ef, vqa_w


def _rand_inputs(mcfg, batch, seed=0):
    rng = np.random.default_rng(seed)
    u8 = rng.integers(0, 256, (batch, mcfg.img_size, mcfg.img_size, 3),
                      dtype=np.uint8)
    qst = rng.integers(0, mcfg.qst_vocab_size, (batch, mcfg.max_qst_len),
                       dtype=np.int32)
    return u8, qst


def test_w_export_roundtrip_symbolic_batch(tiny_cfg):
    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
    artifact = exp_mod.export_state({"w_params": params}, mcfg)
    assert artifact["meta"]["family"] == "w"
    assert sorted(artifact["exported"]) == ["answer_logits"]

    # serialize/deserialize through bytes like a real artifact file would
    model = exp_mod.ServingModel(pickle.loads(pickle.dumps(artifact)))
    scfg = exp_mod._serving_config(mcfg)
    for batch in (2, 5):  # one export, two batch sizes
        u8, qst = _rand_inputs(mcfg, batch, seed=batch)
        got = np.asarray(model.answer_logits(u8, qst))
        from lctvqa.data.pipeline import normalize_images
        want = np.asarray(jax.jit(
            lambda p, u, q: vqa_w.w_forward(p, scfg, normalize_images(u), q,
                                            deterministic=True))(
            artifact["params"]["params"], u8, qst))
        assert got.shape == (batch, mcfg.ans_vocab_size)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ef_darts_export_logits_and_generate(tiny_cfg):
    mcfg = tiny_cfg.model  # darts supernet at 16px
    ef_params, arch = vqa_ef.init_ef_model(jax.random.PRNGKey(1), mcfg)
    artifact = exp_mod.export_state(
        {"ef_params": ef_params, "arch": arch, "epoch": 3}, mcfg)
    assert sorted(artifact["exported"]) == ["answer_logits", "generate"]
    assert artifact["meta"]["epoch"] == 3

    model = exp_mod.ServingModel(artifact)
    scfg = exp_mod._serving_config(mcfg)
    u8, qst = _rand_inputs(mcfg, 3)
    from lctvqa.data.pipeline import normalize_images
    got = np.asarray(model.answer_logits(u8, qst))
    want = np.asarray(jax.jit(
        lambda b, u, q: vqa_ef.ef_forward(
            b["params"], b["arch"], scfg, normalize_images(u), q,
            deterministic=True)[0])(artifact["params"], u8, qst))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    gen_qst, gen_ans = model.generate(u8)
    ref_qst, ref_ans_logits = jax.jit(
        lambda b, u: vqa_ef.ef_generate(
            b["params"], b["arch"], scfg, normalize_images(u),
            deterministic=True))(artifact["params"], u8)
    np.testing.assert_array_equal(np.asarray(gen_qst), np.asarray(ref_qst))
    np.testing.assert_array_equal(np.asarray(gen_ans),
                                  np.argmax(np.asarray(ref_ans_logits), 1))


def test_w_export_int8_matches_quantized_apply(tiny_cfg):
    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed")
    params = vqa_w.init_w_model(jax.random.PRNGKey(2), mcfg)
    artifact = exp_mod.export_state({"w_params": params}, mcfg, int8=True)
    assert artifact["meta"]["int8"] is True
    model = exp_mod.ServingModel(artifact)
    u8, qst = _rand_inputs(mcfg, 4, seed=7)
    scfg = exp_mod._serving_config(mcfg)
    from lctvqa.data.pipeline import normalize_images
    want = np.asarray(jax.jit(
        lambda p, u, q: vqa_w.w_forward(p, scfg, normalize_images(u), q,
                                        deterministic=True))(
        artifact["params"]["params"], u8, qst))
    got = np.asarray(model.answer_logits(u8, qst))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_int8_export_of_darts_supernet_rejected(tiny_cfg):
    mcfg = tiny_cfg.model
    ef_params, arch = vqa_ef.init_ef_model(jax.random.PRNGKey(3), mcfg)
    with pytest.raises(ValueError, match="darts supernet"):
        exp_mod.export_state({"ef_params": ef_params, "arch": arch},
                             mcfg, int8=True)


def test_unified_export_generate_roundtrip(tiny_cfg):
    """darts/unified-family checkpoint layout ({'params': ...}); serving
    is the img -> QA-stream generate; tokens must match exactly."""
    from lctvqa.models import unified as unified_model

    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed")
    params, arch = unified_model.init_unified_model(
        jax.random.PRNGKey(5), mcfg)
    artifact = exp_mod.export_state({"params": params, "epoch": 2}, mcfg)
    assert artifact["meta"]["family"] == "unified"
    assert sorted(artifact["exported"]) == ["generate"]

    model = exp_mod.ServingModel(pickle.loads(pickle.dumps(artifact)))
    scfg = exp_mod._serving_config(mcfg)
    from lctvqa.data.pipeline import normalize_images
    for batch in (2, 5):
        u8, _ = _rand_inputs(mcfg, batch, seed=batch)
        got = np.asarray(model.generate(u8))
        want = np.asarray(jax.jit(
            lambda p, u: unified_model.unified_generate(
                p, None, scfg, normalize_images(u), deterministic=True))(
            artifact["params"]["params"], u8))
        assert got.shape == (batch, mcfg.max_qst_len)
        np.testing.assert_array_equal(got, want)


def test_export_cli_vqa_checkpoint_with_arch(tmp_path, tiny_cfg, synth_dir):
    """CLI --model vqa: darts-family vqa_model.ckpt + arch_par.ckpt merge,
    unified answer-string decoding off the artifact."""
    from lctvqa.models import unified as unified_model
    from lctvqa.train import checkpoint

    from lctvqa.text import VocabDict
    uni = VocabDict(os.path.join(synth_dir, "vocab_unified.txt"))
    # unified models run on the single QA vocab (init_unified_model doc)
    mcfg = dataclasses.replace(tiny_cfg.model,  # darts supernet at 16px
                               qst_vocab_size=uni.vocab_size)
    cfg = dataclasses.replace(tiny_cfg, model=mcfg)
    params, arch = unified_model.init_unified_model(
        jax.random.PRNGKey(6), mcfg)
    exp_dir = tmp_path / "expU"
    os.makedirs(exp_dir)
    checkpoint.save_state(str(exp_dir / "vqa_model.ckpt"),
                          {"params": params, "epoch": 1}, config=cfg)
    checkpoint.save_state(str(exp_dir / "arch_par.ckpt"),
                          {"arch": arch}, config=cfg)
    out = tmp_path / "vqa_serving.lctx"
    exp_mod.main(["--exp", "expU", "--root_stats_dir", str(tmp_path),
                  "--model", "vqa", "--out", str(out),
                  "--input_dir", synth_dir, "--check"])
    model = exp_mod.load_artifact(str(out))
    assert "arch" in model._params  # supernet arch rode into the artifact
    u8, _ = _rand_inputs(mcfg, 2, seed=11)
    ans = model.generated_answers(u8)
    assert len(ans) == 2 and all(isinstance(a, str) for a in ans)


def test_export_cli_roundtrip(tmp_path, tiny_cfg, synth_dir):
    """CLI: checkpoint on disk -> artifact -> --check parity, with the
    vocab embedded from the dataset dir and answers() decoding."""
    from lctvqa.train import checkpoint
    from lctvqa.text import VocabDict

    # vocab sizes from the dataset's files, as training derives them
    # (main.py:176) — export_state refuses mismatched --input_dir
    mcfg = dataclasses.replace(
        tiny_cfg.model, img_size=32, arch_type="fixed",
        qst_vocab_size=VocabDict(
            os.path.join(synth_dir, "vocab_questions.txt")).vocab_size,
        ans_vocab_size=VocabDict(
            os.path.join(synth_dir, "vocab_answers.txt")).vocab_size)
    cfg = dataclasses.replace(tiny_cfg, model=mcfg)
    params = vqa_w.init_w_model(jax.random.PRNGKey(4), mcfg)
    exp_dir = tmp_path / "expX"
    os.makedirs(exp_dir)
    checkpoint.save_state(str(exp_dir / "w_model.ckpt"),
                          {"w_params": params, "epoch": 1}, config=cfg)
    out = tmp_path / "w_serving.lctx"
    exp_mod.main(["--exp", "expX", "--root_stats_dir", str(tmp_path),
                  "--model", "w", "--out", str(out),
                  "--input_dir", synth_dir, "--check"])
    model = exp_mod.load_artifact(str(out))
    # vocab embedded -> string answers come straight off the artifact
    u8, qst = _rand_inputs(mcfg, 2, seed=9)
    ans = model.answers(u8, qst)
    assert len(ans) == 2 and all(isinstance(a, str) for a in ans)
    assert model.meta["lctvqa_version"]


def test_artifact_file_is_pickle_free_zip(tmp_path, tiny_cfg):
    """r3 verdict #8: the artifact file must load with NO code execution.
    Contract: save_artifact writes a zip (meta.json + tree.json + raw
    leaf bytes + StableHLO); read_artifact round-trips the params pytree
    EXACTLY (structure incl. tuple-vs-list, dtypes incl. bfloat16) and
    the restored artifact still serves."""
    import zipfile

    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
    artifact = exp_mod.export_state({"w_params": params}, mcfg)
    path = str(tmp_path / "w.lctx")
    exp_mod.save_artifact(artifact, path)
    assert zipfile.is_zipfile(path)

    back = exp_mod.read_artifact(path)  # no trusted= needed
    assert back["meta"] == artifact["meta"]
    # pytree structure must be IDENTICAL (tuple-vs-list matters to the
    # traced call signature)
    assert (jax.tree_util.tree_structure(back["params"])
            == jax.tree_util.tree_structure(artifact["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(artifact["params"]),
                    jax.tree_util.tree_leaves(back["params"])):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model = exp_mod.load_artifact(path)
    u8, qst = _rand_inputs(mcfg, 2, seed=3)
    got = np.asarray(model.answer_logits(u8, qst))
    want = np.asarray(exp_mod.ServingModel(artifact).answer_logits(u8, qst))
    np.testing.assert_array_equal(got, want)


def test_legacy_pickle_artifact_gated_behind_trusted(tmp_path, tiny_cfg):
    """Legacy pickle artifacts still load, but ONLY with trusted=True
    (serve CLI --trusted); the default refuses with an explanation."""
    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
    artifact = exp_mod.export_state({"w_params": params}, mcfg)
    path = str(tmp_path / "legacy.lctx")
    with open(path, "wb") as f:
        pickle.dump(artifact, f)

    with pytest.raises(ValueError, match="legacy pickle"):
        exp_mod.read_artifact(path)
    model = exp_mod.load_artifact(path, trusted=True)
    u8, qst = _rand_inputs(mcfg, 2, seed=5)
    assert np.asarray(model.answer_logits(u8, qst)).shape == (
        2, mcfg.ans_vocab_size)


def test_export_rejects_mismatched_vocab_dir(tiny_cfg, synth_dir):
    """Chip-found bug: exporting with an --input_dir whose vocab files
    don't match the checkpoint's head sizes embedded a too-short answer
    vocab, and serving IndexError'd on any argmax past the list. The
    export must refuse (export.py export_state vocab check)."""
    mcfg = dataclasses.replace(tiny_cfg.model, img_size=32,
                               arch_type="fixed", ans_vocab_size=1000)
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), mcfg)
    with pytest.raises(ValueError, match="vocab mismatch"):
        exp_mod.export_state({"w_params": params}, mcfg,
                             input_dir=synth_dir)
