"""Immutable configuration for lctvqa.

The reference keeps mutable module-global config (`basic_vqa/config.py:8-98`)
mutated by `update_config(args)`; `darts_vqa/config.py` threads an args object
instead. We take the immutable direction: one frozen dataclass tree, built
once from CLI args, passed explicitly. Hyperparameter defaults mirror the
reference (`basic_vqa/config.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shapes shared by the W and EF models (basic_vqa/config.py:10-20)."""

    img_embed_size: int = 512      # IMG_EMBED_SIZE
    word_embed_size: int = 300     # WORD_EMBED_SIZE
    lstm_hidden_size: int = 512    # LSTM_HIDDEN_SIZE
    lstm_num_layers: int = 1       # LSTM_NUM_LAYERS
    max_qst_len: int = 30          # MAX_QST_LEN
    qst_vocab_size: int = 8192
    ans_vocab_size: int = 1000
    img_size: int = 64
    dropout_rate: float = 0.5
    # 'fixed' -> VGG19 image encoder; 'darts' -> PC-DARTS search network;
    # 'derived' -> fixed network built from `genotype` (post-search retrain).
    arch_type: str = "darts"
    # Genotype for arch_type='derived' (models/genotypes.py presets or a
    # search result). Stored as the Genotype namedtuple.
    genotype: object = None
    pretrained_enc: bool = True    # PRETRAIN_ENC: freeze the VGG features+fc6/7
    # test-only shrink knobs for the VGG19 trunk (production: 1.0 / 4096)
    vgg_width_mult: float = 1.0
    vgg_fc_dim: int = 4096
    # PC-DARTS search-space shape (basic_vqa/models_lct.py:11, model_search.py:96-97)
    darts_init_ch: int = 16
    darts_layers: int = 4
    darts_steps: int = 4
    darts_multiplier: int = 4
    darts_stem_multiplier: int = 3
    darts_partial_k: int = 4       # channel proportion 1/k (model_search.py:33)
    # Numerics: params are always fp32; compute_dtype feeds the MXU.
    compute_dtype: str = "bfloat16"
    # Fused Pallas LSTM cell on TPU (validated vs jnp to 3e-6; ~13% faster
    # 30-step generate scans on v5e); transparently falls back to the jnp
    # cell off-TPU.
    use_pallas_lstm: bool = True
    # Whole-sequence fused LSTM for the W question encoder (only the
    # final (h, c) is consumed, so the T-step scan is one kernel with a
    # time grid and persistent h/c scratch; differentiable via a jnp-scan
    # JVP rule). Opt-in until measured on the chip.
    pallas_seq_lstm: bool = False
    # Whole-loop fused greedy decode (ops/pallas_generate.py): the entire
    # T-step autoregressive generate as ONE kernel with weights resident
    # in VMEM — cell matmuls + vocab head + argmax + embedding row-select
    # per step. Greedy path only (temperature sampling keeps the jnp
    # scan); falls back off-TPU or when the weights exceed the VMEM
    # budget. Opt-in until measured on the chip.
    pallas_generate: bool = False
    # Edge-batched mixed-op execution (models/search_fused.py): same math,
    # fewer/wider launches. Measured on v5e at reference dims: loses in
    # every variant (fwd+bwd 75.5 ms vs 46.8 ms for the default unfused
    # BN-folded path; 151 ms unfolded) — the stacked-edge concats are
    # relayout copies and the E-stacked intermediates defeat XLA's
    # epilogue fusion. Default off; kept as the parity-tested record.
    fuse_mixed_ops: bool = False
    # Track BN running statistics during stage-1 training and use them in
    # validation, reproducing the reference's model.eval() numerics
    # (basic_vqa/experiment.py:292-293). Default off: batch stats at eval
    # (the standard DARTS choice — see ops/conv.py batchnorm docstring).
    bn_eval_stats: bool = False
    # Fold each primitive's FINAL affine-free BN into the alpha mixture
    # (models/search.py:_mixed_fold): same math, but the 8 normalized
    # intermediates per edge are never written — removes most of the BN
    # HBM traffic the search net is bound on. Forced off when
    # bn_eval_stats is on (that mode needs explicit batchnorm calls).
    fold_bn_mixture: bool = True
    # Run each stride-1 mixed op as ONE Pallas kernel inside an
    # [H, W, C, N]-layout trunk (ops/pallas_mixedop, search.py
    # _network_apply_hwcn): all branches + pools + folded BNs + alpha
    # mixture in VMEM. STANDALONE the kernel beats XLA up to ~3x at the
    # cell-0 shape (fwd 0.59 vs 1.12 ms incl dispatch) — but at NETWORK
    # level it loses (fwd 13.5 vs 8.6 ms, fwd+bwd 62.7 vs 46.9): XLA
    # overlaps/fuses work ACROSS edges while 44 custom-calls serialize.
    # Default OFF; kept as a parity-tested opt-in (first-order only —
    # architect closures force it off; >1-device DP meshes too, since the
    # kernel computes per-shard BN stats).
    pallas_mixed_op: bool = False
    # Run the four depthwise-separable mixed-op branches (sep3/5, dil3/5)
    # as ONE packed chain per edge: kernels embedded centered in a shared
    # grouped 9x9 depthwise conv, pointwise convs as one block-diagonal
    # dense matmul, masked inner BN/ReLU (models/search.py
    # _mixed_fold_packed). Same math, ~4x fewer ops on 4x wider channels.
    # Measured on v5e at reference dims: fwd 9.2 -> 27.0 ms, fwd+bwd
    # 46.8 -> 162.7 ms — XLA lowers the channel-multiplier grouped convs
    # to dense multiply+reduce materializations and the copies get WORSE
    # (profile in NOTES.md). Default off; kept as the parity-tested record
    # of the experiment. Requires fold_bn_mixture; off under bn_eval_stats.
    pack_conv_branches: bool = False
    # Rematerialize each DARTS cell in the backward pass (jax.checkpoint):
    # residuals per cell shrink to its two input states. Measured on v5e at
    # reference dims (scripts/microbench_darts.py): fwd+bwd 46.8 -> 68.6 ms
    # — a NET LOSS, because the recomputation is itself HBM-bandwidth-bound
    # (the BN reductions run twice), so it costs a second forward without
    # saving enough residual traffic. Default OFF; turn on only when HBM
    # capacity forces it (e.g. 224px images at large batch).
    remat_cells: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (basic_vqa/config.py:22-76)."""

    learning_rate: float = 1e-3    # LEARNING_RATE (Adam, both EF and W)
    step_size: int = 10            # STEP_SIZE for StepLR
    lr_decay: float = 0.1          # LR_DECAY
    arch_learning_rate: float = 6e-4
    arch_weight_decay: float = 1e-3
    arch_adam_b1: float = 0.5      # Adam betas=(0.5, 0.999) for arch params
    arch_adam_b2: float = 0.999
    grad_clip: float = 5.0
    temperature: float = 0.1       # TEMPERATURE for pseudo-answer softening
    batch_size: int = 64
    num_epochs: int = 30
    train_portion: float = 1.0
    seed: int = 10
    arch_update_freq: int = 2000
    arch_update_freq_min: int = 100
    arch_freq_decay: float = 0.5
    skip_stage2: bool = False
    skip_stage3: bool = True
    w_lambda: float = 1.0
    report_freq: int = 10
    # 'exact'          -> arch gradient by jax.grad through the unrolled
    #                     inner updates, INCLUDING the direct
    #                     alpha->generate->pseudo-label path the reference
    #                     drops (the true gradient of the stated objective).
    # 'exact-indirect' -> same, with that direct path stop-gradiented —
    #                     the reference's truncation in exact-HVP form.
    # 'fd'             -> finite-difference HVPs mirroring the reference
    #                     literally (basic_vqa/pcdarts/architect_lct.py:181-235).
    # Default 'exact-indirect': it reproduces the semantics the reference's
    # 54.72 was trained with at identical measured cost (482 ms/update =
    # exact's, scripts/bench_stage3.py), and the planted-op gradient probe
    # (scripts/ab_architect_modes.py --grad_probe, NOTES.md round-3) found
    # the truncated gradient agrees with fd (cos +0.72) and steers toward
    # the planted op while 'exact' is dominated ~500x by the direct
    # label-fitting path pointing the other way.
    architect_mode: str = "exact-indirect"
    # jax.checkpoint the inner-unroll loss closures of the tri-level
    # architect ('exact' mode): the outer double-backward recomputes the
    # inner forwards instead of keeping their activations live — trades
    # HBM for FLOPs in the stage-3 program. Default ON: at reference dims
    # on v5e it is FASTER (482 vs 558 ms/update — select_and_scatter's
    # padded backward temps cost more HBM traffic than the recompute) and
    # it is the only configuration in which 'exact-indirect' fits HBM
    # (scripts/bench_stage3.py, NOTES.md round-3).
    stage3_remat: bool = True
    # Carry params/opt state through the train loop as packed 1D buffers
    # (ops/packing.py): O(1) argument buffers per stage call instead of
    # O(1000) leaves — dispatch-bound setups (remote/tunneled TPU) gain
    # a lot; identical math everywhere.
    packed_dispatch: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    input_dir: str = "data/vqa/hdf5_64"
    num_workers: int = 8
    use_old_dataloader: bool = False   # v1 npy+JPEG loader vs v2 hdf5 loader
    max_num_ans: int = 10              # MAX_NUM_ANS multi-choice slots
    prefetch: int = 2                  # device prefetch depth
    # image residency: 'ram' | 'lazy' (chunked h5 reads) | 'auto'
    # (ram iff the split fits VqaH5Dataset.PRELOAD_LIMIT_BYTES)
    preload_images: str = "auto"
    # ImageNet normalization (basic_vqa/data_loader_v2.py:84-85)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Data-parallel mesh over ICI. New capability (SURVEY.md §5)."""

    data_axis: str = "data"
    num_devices: int = 0               # 0 -> use all local devices
    # multi-host DP: mesh over ALL processes' devices; every host feeds its
    # disjoint shard of the global batch (parallel/distributed.py). Callers
    # must run jax.distributed.initialize() first (main.py --multihost).
    multihost: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    exp_name: str = "default_exp"
    resume: bool = False
    root_stats_dir: str = "./experiment_data"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def small_test_config() -> Config:
    """A tiny config used by tests and the multichip dry run."""
    return Config(
        model=ModelConfig(
            img_embed_size=32,
            word_embed_size=16,
            lstm_hidden_size=32,
            max_qst_len=8,
            qst_vocab_size=64,
            ans_vocab_size=16,
            img_size=16,
            darts_init_ch=4,
            darts_layers=2,
            compute_dtype="float32",
            vgg_width_mult=0.125,
            vgg_fc_dim=64,
        ),
        train=TrainConfig(batch_size=8, num_epochs=1, arch_update_freq=1,
                          skip_stage3=False),
    )
