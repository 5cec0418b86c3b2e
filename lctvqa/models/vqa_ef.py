"""EF model: the question-generating "test-creator"
(reference `basic_vqa/models_lct.py`).

Image encoder is either the PC-DARTS search network (`arch_type='darts'`,
models_lct.py:9-33) or VGG19 (`arch_type='fixed'`, models_lct.py:35-69,
trainable unless pretrained). The EF question encoder doubles as a decoder:
teacher-forced forward emits per-step vocab logits; `generate` decodes
autoregressively and re-encodes its own output to answer it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import search, vgg
from lctvqa.models.qst_encoder import (ef_qst_encoder, ef_qst_encoder_init,
                                       ef_qst_generate)
from lctvqa.ops import nn as N
from lctvqa.ops.losses import cross_entropy, sequence_teacher_forcing_ce


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None


def init_ef_model(key, cfg: ModelConfig, vgg_params=None):
    """Returns (params, arch). arch is None for arch_type='fixed'."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    params = {}
    arch = None
    if cfg.arch_type == "darts":
        params["darts"] = search.network_init(k1, cfg)
        in_features = search.network_out_features(cfg)
        arch = search.arch_init(k6, cfg)
    elif cfg.arch_type == "derived":
        from lctvqa.models import derived
        assert cfg.genotype is not None, "arch_type='derived' needs genotype"
        params["derived"] = derived.derived_network_init(k1, cfg,
                                                         cfg.genotype)
        in_features = derived.derived_out_features(cfg, cfg.genotype)
    else:
        params["vgg"] = vgg_params if vgg_params is not None \
            else vgg.vgg19_init(k1, cfg.vgg_width_mult, cfg.vgg_fc_dim)
        in_features = vgg.feature_dim(params["vgg"])
    params["img_fc"] = N.torch_linear_init(k2, in_features,
                                           cfg.img_embed_size)
    params["qst"] = ef_qst_encoder_init(
        k3, cfg.qst_vocab_size, cfg.word_embed_size, cfg.img_embed_size,
        cfg.lstm_num_layers, cfg.lstm_hidden_size)
    params["fc1"] = N.torch_linear_init(k4, cfg.img_embed_size,
                                        cfg.ans_vocab_size)
    params["fc2"] = N.torch_linear_init(k5, cfg.ans_vocab_size,
                                        cfg.ans_vocab_size)
    return params, arch


def ef_img_encode(params, arch, cfg: ModelConfig, img,
                  rng=None, deterministic: bool = True):
    """Image -> L2-normalized embed_size feature."""
    dt = _dtype(cfg)
    if cfg.arch_type == "darts":
        if cfg.fuse_mixed_ops:
            from lctvqa.models import search_fused
            feat = search_fused.network_apply_fused(params["darts"], arch,
                                                    cfg, img, dtype=dt)
        else:
            feat = search.network_apply(params["darts"], arch, cfg, img,
                                        dtype=dt)
    elif cfg.arch_type == "derived":
        from lctvqa.models import derived
        feat = derived.derived_network_apply(params["derived"], cfg,
                                             cfg.genotype, img, dtype=dt)
    else:
        vgg_params = params["vgg"]
        if cfg.pretrained_enc:
            # frozen iff pretrained (models_lct.py:59-63)
            vgg_params = jax.lax.stop_gradient(vgg_params)
        feat = vgg.vgg19_features(vgg_params, img, rng=rng,
                                  deterministic=deterministic, dtype=dt)
    return N.l2_normalize(N.linear(params["img_fc"], feat, dtype=dt))


def _answer_head(params, cfg: ModelConfig, img_feature, qst_feature,
                 rng, deterministic):
    dt = _dtype(cfg)
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    x = jnp.tanh(img_feature * qst_feature)
    x = N.dropout(x, cfg.dropout_rate, r1, deterministic)
    x = jnp.tanh(N.linear(params["fc1"], x, dtype=dt))
    x = N.dropout(x, cfg.dropout_rate, r2, deterministic)
    return N.linear(params["fc2"], x, dtype=dt)


def ef_forward(params, arch, cfg: ModelConfig, img, qst,
               rng: Optional[jax.Array] = None,
               deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
    """-> (ans_logits [B, A], qst_logits [B, T, V])  (models_lct.py:200-218)."""
    dt = _dtype(cfg)
    if rng is not None:
        r_enc, r_head = jax.random.split(rng)
    else:
        r_enc = r_head = None
    img_feature = ef_img_encode(params, arch, cfg, img, r_enc, deterministic)
    qst_feature, qst_logits = ef_qst_encoder(
        params["qst"], qst, img_feature, dtype=dt,
        use_pallas=cfg.use_pallas_lstm,
        use_pallas_seq=cfg.pallas_seq_lstm)
    ans = _answer_head(params, cfg, img_feature, qst_feature, r_head,
                       deterministic)
    return ans, qst_logits


def ef_generate(params, arch, cfg: ModelConfig, img,
                rng: Optional[jax.Array] = None,
                deterministic: bool = True,
                sample_deterministic: bool = True,
                temperature: float = 0.1) -> Tuple[jax.Array, jax.Array]:
    """Generate a pseudo question then answer it (models_lct.py:220-241).

    `deterministic` gates dropout (training applies it — the reference calls
    generate with the model in train() mode); `sample_deterministic` picks
    argmax vs temperature sampling for the tokens.
    Returns (qst int32 [B, T], ans_logits [B, A]).
    """
    dt = _dtype(cfg)
    if rng is not None:
        r_enc, r_sample, r_head = jax.random.split(rng, 3)
    else:
        r_enc = r_sample = r_head = None
    img_feature = ef_img_encode(params, arch, cfg, img, r_enc, deterministic)
    qst = ef_qst_generate(params["qst"], img_feature, cfg.max_qst_len,
                          rng=r_sample, deterministic=sample_deterministic,
                          temperature=temperature, dtype=dt,
                          use_pallas=cfg.use_pallas_lstm,
                          use_pallas_generate=cfg.pallas_generate)
    qst_feature, _ = ef_qst_encoder(params["qst"], qst, img_feature,
                                    dtype=dt,
                                    use_pallas=cfg.use_pallas_lstm,
                                    use_pallas_seq=cfg.pallas_seq_lstm)
    ans = _answer_head(params, cfg, img_feature, qst_feature, r_head,
                       deterministic)
    return qst, ans


def ef_loss(params, arch, cfg: ModelConfig, img, qst, labels,
            rng=None, deterministic: bool = True, qst_only: bool = False):
    """Answer CE + shifted teacher-forcing question CE
    (models_lct.py:250-257). qst_only drops the answer term
    (darts_vqa/vqa_model.py:351-364)."""
    ans_logits, qst_logits = ef_forward(params, arch, cfg, img, qst, rng,
                                        deterministic)
    qst_ce = sequence_teacher_forcing_ce(qst_logits, qst)
    if qst_only:
        return qst_ce
    return cross_entropy(ans_logits, labels) + qst_ce
