"""Unified QA-stream model (reference `darts_vqa/vqa_model.py:198-232,
366-422`): the model reads/writes ONE token stream
`<start> question <sep> answer <end> <pad>...` and is trained with
next-token cross entropy only — no separate answer head.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import search, vgg
from lctvqa.models.qst_encoder import ef_qst_generate
from lctvqa.ops import nn as N
from lctvqa.ops.lstm import lstm, lstm_init
from lctvqa.ops.losses import sequence_teacher_forcing_ce


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None


def init_unified_model(key, cfg: ModelConfig, vgg_params=None):
    """cfg.qst_vocab_size is the UNIFIED vocab size here.
    Returns (params, arch) — arch None for the vgg encoder."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {}
    arch = None
    if cfg.arch_type == "darts":
        params["darts"] = search.network_init(k1, cfg)
        in_features = search.network_out_features(cfg)
        arch = search.arch_init(k5, cfg)
    else:
        params["vgg"] = vgg_params if vgg_params is not None \
            else vgg.vgg19_init(k1, cfg.vgg_width_mult, cfg.vgg_fc_dim)
        in_features = vgg.feature_dim(params["vgg"])
    params["img_fc"] = N.torch_linear_init(k2, in_features,
                                           cfg.img_embed_size)
    params["qa"] = {
        "word2vec": N.embedding_init(k3, cfg.qst_vocab_size,
                                     cfg.word_embed_size),
        "lstm": lstm_init(k4, cfg.word_embed_size, cfg.lstm_hidden_size,
                          cfg.lstm_num_layers),
        # vocab head: xavier + zero bias as the QstAnsEncoder
        # (darts_vqa/vqa_model.py:198-232 uses the same init scheme)
        "fc2": N.xavier_linear_init(jax.random.fold_in(k4, 1),
                                    cfg.lstm_hidden_size,
                                    cfg.qst_vocab_size),
    }
    return params, arch


def _img_encode(params, arch, cfg: ModelConfig, img, rng, deterministic):
    dt = _dtype(cfg)
    if cfg.arch_type == "darts":
        if cfg.fuse_mixed_ops:
            from lctvqa.models import search_fused
            feat = search_fused.network_apply_fused(params["darts"], arch,
                                                    cfg, img, dtype=dt)
        else:
            feat = search.network_apply(params["darts"], arch, cfg, img,
                                        dtype=dt)
    else:
        vgg_params = params["vgg"]
        if cfg.pretrained_enc:
            vgg_params = jax.lax.stop_gradient(vgg_params)
        feat = vgg.vgg19_features(vgg_params, img, rng=rng,
                                  deterministic=deterministic, dtype=dt)
    return N.l2_normalize(N.linear(params["img_fc"], feat, dtype=dt))


def unified_forward(params, arch, cfg: ModelConfig, img, qa_str,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True) -> jax.Array:
    """-> next-token logits [B, T, V] (teacher forced, image embedding as
    the LSTM initial state)."""
    dt = _dtype(cfg)
    img_feature = _img_encode(params, arch, cfg, img, rng, deterministic)
    b = qa_str.shape[0]
    x = jnp.tanh(N.embed(params["qa"]["word2vec"], qa_str))
    layers = params["qa"]["lstm"]["layers"]
    if cfg.pallas_seq_lstm and len(layers) == 1:
        # whole T-step recurrence as one kernel (ops/pallas_lstm.py)
        from lctvqa.ops.pallas_lstm import lstm_seq_pallas
        h0 = img_feature.reshape(b, -1)
        outs, _ = lstm_seq_pallas(layers[0], x, h0, h0, dtype=dt,
                                  use_pallas_fallback=cfg.use_pallas_lstm)
    else:
        h0 = img_feature.reshape(1, b, -1)
        outs, _ = lstm(params["qa"]["lstm"], x, h0=h0, c0=h0, dtype=dt,
                       use_pallas=cfg.use_pallas_lstm)
    return N.linear(params["qa"]["fc2"], jnp.tanh(outs), dtype=dt)


def unified_generate(params, arch, cfg: ModelConfig, img,
                     rng: Optional[jax.Array] = None,
                     deterministic: bool = True,
                     sample_deterministic: bool = True,
                     temperature: float = 0.1) -> jax.Array:
    """Autoregressive `<start> q <sep> a <end>` stream, int32 [B, T]."""
    img_feature = _img_encode(params, arch, cfg, img, rng, deterministic)
    return ef_qst_generate(params["qa"], img_feature, cfg.max_qst_len,
                           rng=rng, deterministic=sample_deterministic,
                           temperature=temperature, dtype=_dtype(cfg),
                           use_pallas=cfg.use_pallas_lstm,
                           use_pallas_generate=cfg.pallas_generate)


def unified_loss(params, arch, cfg: ModelConfig, img, qa_str,
                 rng=None, deterministic: bool = True):
    """Next-token CE over the whole stream (darts_vqa/vqa_model.py:417-422,
    exp_unified.py:70-77)."""
    logits = unified_forward(params, arch, cfg, img, qa_str, rng,
                             deterministic)
    return sequence_teacher_forcing_ce(logits, qa_str)
