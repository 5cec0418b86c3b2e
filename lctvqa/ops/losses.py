"""Losses: cross entropy and soft cross entropy.

Semantics match torch `nn.CrossEntropyLoss` (mean reduction) and the
reference's `softXEnt` (`basic_vqa/models.py:7-10`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """logits [N, C] fp32, labels [N] int -> scalar mean CE."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.mean(nll)


def soft_xent(logits, target_probs):
    """-(target * log_softmax(pred)).sum() / N  (basic_vqa/models.py:7-10)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(target_probs * logp) / logits.shape[0]


def sequence_teacher_forcing_ce(qst_logits, questions):
    """Shifted next-token CE: CE(logits[:, :-1] vs question[:, 1:]) flattened.

    Matches `basic_vqa/models_lct.py:250-257` — note the reference does NOT
    mask pad positions; `<pad>` is an ordinary target class. Keep that for
    parity.
    """
    v = qst_logits.shape[-1]
    pred = qst_logits[:, :-1].reshape(-1, v)
    tgt = questions[:, 1:].reshape(-1)
    return cross_entropy(pred, tgt)
