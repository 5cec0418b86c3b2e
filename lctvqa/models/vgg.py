"""VGG19 feature extractor (torchvision 'E' config) in NHWC JAX.

The reference wraps `torchvision.models.vgg19(pretrained=True)` with the
final classifier Linear removed (`basic_vqa/models.py:22-29`), leaving
features -> AdaptiveAvgPool(7) -> fc6 -> ReLU -> Dropout -> fc7 -> ReLU ->
Dropout, a 4096-dim image feature. `convert_torch_state_dict` imports a
torchvision `state_dict()` so pretrained weights can be used when a weights
file is available (this environment cannot download them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lctvqa.ops import conv as C
from lctvqa.ops import nn as N

# torchvision cfg 'E' (vgg19): numbers are conv output channels, 'M' = maxpool
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def vgg19_init(key, width_mult: float = 1.0, fc_dim: int = 4096):
    """Random init with torch default conv/linear distributions.

    width_mult < 1 shrinks every conv width (test/debug configs only; the
    production model is the reference-exact width_mult=1, fc_dim=4096).
    """
    convs = []
    c_in = 3
    c_last = 3
    for v in VGG19_CFG:
        if v == "M":
            continue
        key, k = jax.random.split(key)
        c_out = max(1, int(v * width_mult))
        convs.append(C.torch_conv_init(k, 3, 3, c_in, c_out, bias=True))
        c_in = c_out
        c_last = c_out
    key, k6, k7 = jax.random.split(key, 3)
    return {
        "features": convs,
        "fc6": N.torch_linear_init(k6, c_last * 7 * 7, fc_dim),
        "fc7": N.torch_linear_init(k7, fc_dim, fc_dim),
    }


def feature_dim(params) -> int:
    """Output width of the kept classifier (4096 for real VGG19)."""
    return params["fc7"]["w"].shape[1]


def vgg19_features(params, x, rng: Optional[jax.Array] = None,
                   deterministic: bool = True, dtype=None):
    """x: NHWC normalized image -> [B, 4096] feature.

    Dropout in the kept classifier layers is active in train mode exactly as
    in the reference (the torch module stays in train() even under no_grad).
    """
    conv_i = 0
    for v in VGG19_CFG:
        if v == "M":
            x = C.max_pool(x, 2, 2)
        else:
            x = C.conv2d(params["features"][conv_i], x, stride=1, padding=1,
                         dtype=dtype)
            x = jnp.maximum(x, 0.0)
            conv_i += 1
    x = C.adaptive_avg_pool(x, 7)
    # torch flattens NCHW (C-major); match the element order so converted
    # pretrained fc6 weights line up: NHWC -> NCHW -> flatten.
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    x = N.linear(params["fc6"], x, dtype=dtype)
    x = jnp.maximum(x, 0.0)
    x = N.dropout(x, 0.5, r1, deterministic)
    x = N.linear(params["fc7"], x, dtype=dtype)
    x = jnp.maximum(x, 0.0)
    x = N.dropout(x, 0.5, r2, deterministic)
    return x


def convert_torch_state_dict(state_dict) -> dict:
    """torchvision vgg19 state_dict -> our pytree.

    Accepts tensors or numpy arrays. Conv weights [O,I,kh,kw] -> HWIO;
    linear weights [O,I] -> [I,O]. classifier.0 -> fc6, classifier.3 -> fc7.
    """
    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    convs = []
    idx = 0
    layer = 0
    for v in VGG19_CFG:
        if v == "M":
            layer += 1
            continue
        w = arr(state_dict[f"features.{layer}.weight"])
        b = arr(state_dict[f"features.{layer}.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "b": jnp.asarray(b)})
        layer += 2  # conv + relu
        idx += 1
    out = {"features": convs}
    for name, tkey in (("fc6", "classifier.0"), ("fc7", "classifier.3")):
        w = arr(state_dict[f"{tkey}.weight"])
        b = arr(state_dict[f"{tkey}.bias"])
        out[name] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    return out


def load_pretrained(path: str) -> dict:
    """Load a torch-saved vgg19 state_dict file and convert."""
    import torch  # local import: torch is host-side tooling only
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(sd)
