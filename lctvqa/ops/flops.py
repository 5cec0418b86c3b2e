"""Analytic model FLOPs (matmul/conv multiply-adds, counted as 2 ops) and
TPU peak-throughput table — the inputs to the MFU numbers in bench.py.

Only MXU work is counted (convs, matmuls, LSTM gate matmuls); elementwise,
BN statistics and pooling are bandwidth, not FLOPs, per the standard MFU
convention. Counts follow the exact layer shapes of models/vgg.py,
models/search.py and models/qst_encoder.py.
"""

from __future__ import annotations

from lctvqa.config import ModelConfig
from lctvqa.models.genotypes import PRIMITIVES
from lctvqa.models.search import OUTPUT_SIZE, cell_schedule
from lctvqa.models.vgg import VGG19_CFG


def conv_flops(n, h_out, w_out, c_in, c_out, kh, kw, groups=1) -> float:
    return 2.0 * n * h_out * w_out * (c_in // groups) * kh * kw * c_out


def linear_flops(n, d_in, d_out) -> float:
    return 2.0 * n * d_in * d_out


def lstm_flops(n, t, d_in, hidden) -> float:
    """4 gate matmuls on input + 4 on hidden, per step."""
    return t * 2.0 * n * (d_in + hidden) * 4 * hidden


def vgg19_fwd_flops(n: int, img: int, width_mult: float = 1.0,
                    fc_dim: int = 4096) -> float:
    total, c_in, hw = 0.0, 3, img
    for v in VGG19_CFG:
        if v == "M":
            hw //= 2
            continue
        c_out = max(1, int(v * width_mult))
        total += conv_flops(n, hw, hw, c_in, c_out, 3, 3)
        c_in = c_out
    total += linear_flops(n, c_in * 7 * 7, fc_dim)
    total += linear_flops(n, fc_dim, fc_dim)
    return total


def _op_flops(prim: str, n: int, hw: int, ch: int, stride: int) -> float:
    """Conv FLOPs of one search-space primitive on [n, hw, hw, ch]."""
    out = hw // stride
    if prim in ("sep_conv_3x3", "sep_conv_5x5", "sep_conv_7x7"):
        k = int(prim[-1])
        # ReLU-dw-pw-BN twice (second at stride 1)
        f = conv_flops(n, out, out, ch, ch, k, k, groups=ch)
        f += conv_flops(n, out, out, ch, ch, 1, 1)
        f += conv_flops(n, out, out, ch, ch, k, k, groups=ch)
        f += conv_flops(n, out, out, ch, ch, 1, 1)
        return f
    if prim in ("dil_conv_3x3", "dil_conv_5x5"):
        k = int(prim[-1])
        return (conv_flops(n, out, out, ch, ch, k, k, groups=ch)
                + conv_flops(n, out, out, ch, ch, 1, 1))
    if prim == "conv_7x1_1x7":
        return (conv_flops(n, hw, out, ch, ch, 1, 7)
                + conv_flops(n, out, out, ch, ch, 7, 1))
    if prim == "skip_connect" and stride != 1:
        return 2 * conv_flops(n, out, out, ch, ch // 2, 1, 1)
    return 0.0  # none / pools / identity


def darts_fwd_flops(cfg: ModelConfig, n: int) -> float:
    """PC-DARTS search network forward (models/search.py): stem + per-cell
    preprocess 1x1s + all 8 primitives on the C/k partial channels of every
    edge + the adaptive-pool matmuls."""
    img = cfg.img_size
    k = cfg.darts_partial_k
    total = conv_flops(n, img, img, 3,
                       cfg.darts_stem_multiplier * cfg.darts_init_ch, 3, 3)
    hw = img
    for spec in cell_schedule(cfg):
        c = spec["c"]
        in_hw = hw
        out_hw = hw // 2 if spec["reduction"] else hw
        # preprocess: pre0 (1x1, or factorized-reduce when the PREVIOUS
        # cell reduced — s0 is then at 2x resolution and pre0 halves it to
        # in_hw) + pre1 (1x1 at in_hw)
        if spec["reduction_prev"]:
            total += 2 * conv_flops(n, in_hw, in_hw,
                                    spec["c_pp"], c // 2, 1, 1)
        else:
            total += conv_flops(n, in_hw, in_hw, spec["c_pp"], c, 1, 1)
        total += conv_flops(n, in_hw, in_hw, spec["c_p"], c, 1, 1)
        for i in range(cfg.darts_steps):
            for j in range(2 + i):
                stride = 2 if spec["reduction"] and j < 2 else 1
                edge_hw = in_hw if stride == 2 else out_hw
                for prim in PRIMITIVES:
                    total += _op_flops(prim, n, edge_hw, c // k, stride)
        hw = out_hw
    c_prev = cfg.darts_multiplier * cell_schedule(cfg)[-1]["c"]
    # adaptive pool as two matmuls (ops/conv.py:adaptive_avg_pool)
    total += 2.0 * n * OUTPUT_SIZE * hw * hw * c_prev
    total += 2.0 * n * OUTPUT_SIZE * OUTPUT_SIZE * hw * c_prev
    return total


def derived_fwd_flops(cfg: ModelConfig, n: int) -> float:
    """Derived-genotype network forward (models/derived.py): stem +
    per-cell preprocess 1x1s + the 2 CHOSEN ops per node at FULL channels
    (no 1/k partial slice, no 8-way mixture) + the adaptive-pool matmuls.
    """
    from lctvqa.models.derived import _gene, derived_cell_schedule

    geno = cfg.genotype
    img = cfg.img_size
    total = conv_flops(n, img, img, 3,
                       cfg.darts_stem_multiplier * cfg.darts_init_ch, 3, 3)
    hw = img
    sched = derived_cell_schedule(cfg, geno)
    for spec in sched:
        c = spec["c"]
        in_hw = hw
        out_hw = hw // 2 if spec["reduction"] else hw
        if spec["reduction_prev"]:
            total += 2 * conv_flops(n, in_hw, in_hw,
                                    spec["c_pp"], c // 2, 1, 1)
        else:
            total += conv_flops(n, in_hw, in_hw, spec["c_pp"], c, 1, 1)
        total += conv_flops(n, in_hw, in_hw, spec["c_p"], c, 1, 1)
        gene, _concat = _gene(geno, spec["reduction"])
        for prim, j in gene:
            stride = 2 if spec["reduction"] and j < 2 else 1
            edge_hw = in_hw if stride == 2 else out_hw
            total += _op_flops(prim, n, edge_hw, c, stride)
        hw = out_hw
    _gene_last, concat = _gene(geno, sched[-1]["reduction"])
    c_prev = len(concat) * sched[-1]["c"]
    total += 2.0 * n * OUTPUT_SIZE * hw * hw * c_prev
    total += 2.0 * n * OUTPUT_SIZE * OUTPUT_SIZE * hw * c_prev
    return total


def w_fwd_flops(cfg: ModelConfig, n: int) -> float:
    """W model forward (models/vqa_w.py)."""
    total = vgg19_fwd_flops(n, cfg.img_size, cfg.vgg_width_mult,
                            cfg.vgg_fc_dim)
    total += linear_flops(n, cfg.vgg_fc_dim, cfg.img_embed_size)
    total += lstm_flops(n, cfg.max_qst_len, cfg.word_embed_size,
                        cfg.lstm_hidden_size)
    total += linear_flops(n, 2 * cfg.lstm_num_layers * cfg.lstm_hidden_size,
                          cfg.img_embed_size)
    total += linear_flops(n, cfg.img_embed_size, cfg.ans_vocab_size)
    total += linear_flops(n, cfg.ans_vocab_size, cfg.ans_vocab_size)
    return total


def ef_fwd_flops(cfg: ModelConfig, n: int, qlen: int = None) -> float:
    """EF model teacher-forced forward (models/vqa_ef.py, darts encoder)."""
    t = qlen if qlen is not None else cfg.max_qst_len
    if cfg.arch_type == "darts":
        enc = darts_fwd_flops(cfg, n)
        feat = (cfg.darts_multiplier * cell_schedule(cfg)[-1]["c"]
                * OUTPUT_SIZE * OUTPUT_SIZE)
    elif cfg.arch_type == "derived":
        from lctvqa.models.derived import derived_out_features
        enc = derived_fwd_flops(cfg, n)
        feat = derived_out_features(cfg, cfg.genotype)
    else:
        enc = vgg19_fwd_flops(n, cfg.img_size, cfg.vgg_width_mult,
                              cfg.vgg_fc_dim)
        feat = cfg.vgg_fc_dim
    total = enc + linear_flops(n, feat, cfg.img_embed_size)
    total += lstm_flops(n, t, cfg.word_embed_size, cfg.lstm_hidden_size)
    total += linear_flops(n, 2 * cfg.lstm_num_layers * cfg.lstm_hidden_size,
                          cfg.img_embed_size)
    # per-step vocab head fc2 over T steps
    total += t * linear_flops(n, cfg.lstm_hidden_size, cfg.qst_vocab_size)
    total += linear_flops(n, cfg.img_embed_size, cfg.ans_vocab_size)
    total += linear_flops(n, cfg.ans_vocab_size, cfg.ans_vocab_size)
    return total


def ef_generate_flops(cfg: ModelConfig, n: int) -> float:
    """generate(): encode image, T autoregressive LSTM+head steps, then
    re-encode the generated question and answer it."""
    t = cfg.max_qst_len
    gen_loop = (lstm_flops(n, t, cfg.word_embed_size, cfg.lstm_hidden_size)
                + t * linear_flops(n, cfg.lstm_hidden_size,
                                   cfg.qst_vocab_size))
    return ef_fwd_flops(cfg, n) + gen_loop


TPU_PEAK_BF16 = {
    # chip-level dense bf16 peak FLOPs/s (public spec sheets)
    "v4": 275e12,
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v5lite": 197e12,   # axon reports device_kind "TPU v5 lite"
    "v5p": 459e12,
    "v6e": 918e12,
    "trillium": 918e12,
}


def peak_flops(device=None) -> float:
    """bf16 peak of the attached chip, or 0.0 if unknown (MFU then NaN)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, val in TPU_PEAK_BF16.items():
        if key in kind:
            return val
    return 0.0
