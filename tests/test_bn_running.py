"""BN running-statistics (eval-mode) support: torch-parity of the
capture -> momentum update -> eval path, and the LCT steps integration
(reference model.eval() in validation, basic_vqa/experiment.py:292-293)."""

import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from lctvqa.ops import conv as C


def test_running_stats_match_torch_batchnorm():
    """Train-mode forwards update running stats exactly like torch
    BatchNorm2d (momentum 0.1, unbiased var); eval-mode normalization with
    those stats matches torch .eval()."""
    rng = np.random.RandomState(0)
    ch = 3
    batches = [rng.randn(4, 5, 5, ch).astype(np.float32) for _ in range(3)]
    x_eval = rng.randn(4, 5, 5, ch).astype(np.float32)

    bn = torch.nn.BatchNorm2d(ch, affine=False)
    bn.train()
    torch_train_outs = [
        bn(torch.tensor(x).permute(0, 3, 1, 2)).detach()
        .permute(0, 2, 3, 1).numpy() for x in batches]
    bn.eval()
    torch_eval = bn(torch.tensor(x_eval).permute(0, 3, 1, 2)).detach() \
        .permute(0, 2, 3, 1).numpy()

    running = None
    for x, t_out in zip(batches, torch_train_outs):
        with C.bn_capture() as cap:
            ours = C.batchnorm({}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), t_out,
                                   rtol=1e-4, atol=1e-4)
        if running is None:
            running = C.init_running_stats(cap.stats)
        running = C.update_running_stats(running, cap.stats)

    np.testing.assert_allclose(np.asarray(running[0]["mean"]),
                               bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(running[0]["var"]),
                               bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)
    with C.bn_eval(running):
        ours_eval = C.batchnorm({}, jnp.asarray(x_eval))
    np.testing.assert_allclose(np.asarray(ours_eval), torch_eval,
                               rtol=1e-4, atol=1e-4)


def test_bn_eval_consumption_mismatch_raises():
    x = jnp.ones((2, 3, 3, 2))
    with C.bn_capture() as cap:
        C.batchnorm({}, x)
    running = C.init_running_stats(cap.stats)
    import pytest
    with pytest.raises(ValueError, match="consumed"):
        with C.bn_eval(running):
            pass  # zero calls, one entry provided


def test_lct_steps_with_bn_eval_stats(tiny_cfg):
    """Stage1 returns captured BN stats; bn_update maintains running stats;
    eval consumes them — end-to-end through the jitted steps."""
    from lctvqa.train.steps import make_lct_steps
    from lctvqa.models import vqa_ef

    cfg = tiny_cfg.replace(model=dataclasses.replace(
        tiny_cfg.model, bn_eval_stats=True))
    m = cfg.model
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, m)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)

    b = cfg.train.batch_size
    batch = {
        "image_u8": np.random.RandomState(0).randint(
            0, 255, (b, m.img_size, m.img_size, 3), dtype=np.uint8),
        "question": np.random.RandomState(1).randint(
            0, m.qst_vocab_size, (b, m.max_qst_len)).astype(np.int32),
        "answer_label": np.random.RandomState(2).randint(
            0, m.ans_vocab_size, (b,)).astype(np.int32),
        "answer_multi_choice": np.full((b, 10), -1, np.int32),
    }
    ef_params, ef_opt, loss, c1, c2, bn_stats = steps["stage1"](
        ef_params, arch, ef_opt, batch, key)
    assert len(bn_stats) > 0
    running = steps["bn_update"](None, bn_stats)
    assert len(running) == len(bn_stats)
    # another step: running stats update in place
    running2 = steps["bn_update"](running, bn_stats)
    assert np.isfinite(float(loss))
    loss_e, _, _, gen_qst, _ = steps["eval"](ef_params, arch, batch, key,
                                             running2)
    assert np.isfinite(float(loss_e))
    assert gen_qst.shape == (b, m.max_qst_len)
    # batch-stat eval (running=None retrace) also works and differs
    loss_b, _, _, _, _ = steps["eval"](ef_params, arch, batch, key, None)
    assert np.isfinite(float(loss_b))
