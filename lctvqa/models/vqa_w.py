"""W model: the baseline VQA learner (reference `basic_vqa/models.py`).

Frozen VGG19 image feature -> fc -> L2 normalize; W-style question encoder;
elementwise-mul fusion -> tanh -> dropout -> fc1 -> tanh -> dropout -> fc2.

Pure functions over a param pytree. The VGG trunk (features + fc6/fc7, 36
arrays) is ALWAYS frozen in the W model (`models.py:35-36` runs it under
no_grad): we stop_gradient the subtree inside apply, so its gradient leaves
are exact zeros — the functional analogue of the reference's `allow_unused`
zero-filling with `exp_zero_grad=36` (`architect_lct.py:157-179`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import vgg
from lctvqa.models.qst_encoder import w_qst_encoder, w_qst_encoder_init
from lctvqa.ops import nn as N
from lctvqa.ops.losses import cross_entropy, soft_xent


def init_w_model(key, cfg: ModelConfig, vgg_params=None):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if vgg_params is None:
        vgg_params = vgg.vgg19_init(k1, cfg.vgg_width_mult, cfg.vgg_fc_dim)
    return {
        "vgg": vgg_params,
        "img_fc": N.torch_linear_init(k2, vgg.feature_dim(vgg_params),
                                      cfg.img_embed_size),
        "qst": w_qst_encoder_init(k3, cfg.qst_vocab_size,
                                  cfg.word_embed_size, cfg.img_embed_size,
                                  cfg.lstm_num_layers, cfg.lstm_hidden_size),
        "fc1": N.torch_linear_init(k4, cfg.img_embed_size,
                                   cfg.ans_vocab_size),
        "fc2": N.torch_linear_init(k5, cfg.ans_vocab_size,
                                   cfg.ans_vocab_size),
    }


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None


def w_forward(params, cfg: ModelConfig, img, qst,
              rng: Optional[jax.Array] = None, deterministic: bool = True):
    """img NHWC fp32 normalized, qst int32 [B, T] -> ans logits [B, A]."""
    dt = _dtype(cfg)
    if rng is not None:
        r_vgg, r1, r2 = jax.random.split(rng, 3)
    else:
        r_vgg = r1 = r2 = None
    vgg_params = jax.lax.stop_gradient(params["vgg"])  # frozen trunk
    feat = vgg.vgg19_features(vgg_params, img, rng=r_vgg,
                              deterministic=deterministic, dtype=dt)
    img_feature = N.l2_normalize(N.linear(params["img_fc"], feat, dtype=dt))
    qst_feature = w_qst_encoder(params["qst"], qst, dtype=dt,
                                use_pallas=cfg.use_pallas_lstm,
                                use_pallas_seq=cfg.pallas_seq_lstm)
    x = jnp.tanh(img_feature * qst_feature)
    x = N.dropout(x, cfg.dropout_rate, r1, deterministic)
    x = jnp.tanh(N.linear(params["fc1"], x, dtype=dt))
    x = N.dropout(x, cfg.dropout_rate, r2, deterministic)
    return N.linear(params["fc2"], x, dtype=dt)


def w_loss(params, cfg: ModelConfig, img, qst, labels,
           rng=None, deterministic: bool = True):
    """CE of answers (models.py:113-116)."""
    logits = w_forward(params, cfg, img, qst, rng, deterministic)
    return cross_entropy(logits, labels)


def w_soft_loss(params, cfg: ModelConfig, img, qst, labels,
                pseudo_qst, pseudo_ans, w_lambda: float,
                rng=None, deterministic: bool = True):
    """Real CE + w_lambda * softXEnt on EF's pseudo QA (models.py:118-125)."""
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    logits_real = w_forward(params, cfg, img, qst, r1, deterministic)
    loss_real = cross_entropy(logits_real, labels)
    logits_pseudo = w_forward(params, cfg, img, pseudo_qst, r2, deterministic)
    loss_pseudo = soft_xent(logits_pseudo, pseudo_ans)
    return loss_real + w_lambda * loss_pseudo
