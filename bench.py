"""Benchmark: end-to-end VQA pairs/sec/chip (preproc + inference) of the
basic VQA model (VGG19 + LSTM) at the reference measurement config
(BASELINE.md: batch 64, 64x64 images, qst len 30, 1000 answers).

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": R}
as soon as the inference section lands, then RE-PRINTS it enriched after
every further section (train / train_derived / int8 / dispatch) — the
last printed line is always the most complete valid record, and an
external kill at any point still leaves a parseable headline on stdout
(round-4 lesson: the r4 bench blew an unbounded wall clock, rc=124, and
the round had no perf record at all).

Wall clock is bounded by BENCH_BUDGET_S (default 2100 s): every
section's subprocess timeout and retry count derive from the REMAINING
budget, and sections are skipped (recorded as *_skipped) when the budget
can no longer cover them. Section results are persisted to
bench_details.json the moment they land.

vs_baseline is the ratio against the CPU reference implementation (the
same model re-executed in pure PyTorch on this host, measured once and
cached in baseline_cpu.json). BASELINE.json's north star is >=5x.

Test knobs (tests/test_bench_sections.py): BENCH_TINY=1 shrinks every
dimension; BENCH_PLATFORM=cpu pins the JAX backend (the axon TPU plugin
ignores JAX_PLATFORMS, the config knob works); BENCH_FAKE_HANG_SECTION=x
makes section x sleep forever to exercise the budget machinery.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BATCH = 64
IMG = 64
QLEN = 30
QVOCAB = 8192
AVOCAB = 1000
# Serving batch for the headline: batch sweep winner on the v5e
# (scripts/bench_infer_batch.py; 2048+ fails to compile).
SERVE_BATCH = 1024
if os.environ.get("BENCH_TINY"):
    BATCH, IMG, QLEN, QVOCAB, AVOCAB, SERVE_BATCH = 8, 32, 8, 64, 16, 16
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_cpu.json")
DETAILS_FILE = os.environ.get(
    "BENCH_DETAILS_FILE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_details.json"))

# ---- global wall-clock budget (round-4 verdict #1) ----------------------
DEFAULT_BUDGET_S = 2100.0
_START = time.monotonic()
# Floor under which a section is not even attempted (a TPU section's
# compile alone takes ~1 min through the axon remote-compile service).
MIN_SECTION_S = float(os.environ.get("BENCH_MIN_SECTION_S", 90.0))
# No single subprocess attempt may exceed this even with budget to spare.
SECTION_CAP_S = float(os.environ.get("BENCH_SECTION_CAP_S", 1500.0))


def _budget_s() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", DEFAULT_BUDGET_S))


def _remaining() -> float:
    return _budget_s() - (time.monotonic() - _START)


class BudgetExceeded(RuntimeError):
    pass


def _apply_platform():
    """Honor BENCH_PLATFORM before any backend init (the axon TPU plugin
    ignores the JAX_PLATFORMS env var; the config knob is honored)."""
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def _torch_reference_pairs_per_sec(iters: int = 3) -> float:
    """Reference W model (models.py:71-104) in pure torch on CPU,
    including the ToTensor+Normalize preprocessing from uint8."""
    import torch
    import torch.nn as nn

    class TorchVgg19Features(nn.Module):
        CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

        def __init__(self):
            super().__init__()
            layers, c_in = [], 3
            for v in self.CFG:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers += [nn.Conv2d(c_in, v, 3, padding=1),
                               nn.ReLU(inplace=True)]
                    c_in = v
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d(7)
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(inplace=True),
                nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(inplace=True),
                nn.Dropout())

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    class TorchWModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.vgg = TorchVgg19Features()
            self.img_fc = nn.Linear(4096, 512)
            self.embed = nn.Embedding(QVOCAB, 300)
            self.lstm = nn.LSTM(300, 512)
            self.qst_fc = nn.Linear(2 * 512, 512)
            self.fc1 = nn.Linear(512, AVOCAB)
            self.fc2 = nn.Linear(AVOCAB, AVOCAB)

        def forward(self, img, qst):
            with torch.no_grad():
                f = self.vgg(img)
            f = self.img_fc(f)
            f = f / f.norm(p=2, dim=1, keepdim=True)
            q = torch.tanh(self.embed(qst)).transpose(0, 1)
            _, (h, c) = self.lstm(q)
            q = torch.cat((h, c), 2).transpose(0, 1).reshape(img.shape[0],
                                                             -1)
            q = self.qst_fc(torch.tanh(q))
            x = torch.tanh(f * q)
            x = torch.tanh(self.fc1(x))
            return self.fc2(x)

    model = TorchWModel().eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    u8 = torch.randint(0, 256, (BATCH, IMG, IMG, 3), dtype=torch.uint8)
    qst = torch.randint(0, QVOCAB, (BATCH, QLEN))

    def run_once():
        img = u8.permute(0, 3, 1, 2).float() / 255.0
        img = (img - mean) / std
        with torch.no_grad():
            return model(img, qst)

    run_once()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = time.perf_counter() - t0
    return BATCH * iters / dt


def _get_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["pairs_per_sec"]
    pps = _torch_reference_pairs_per_sec()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"pairs_per_sec": pps, "what": "reference W model "
                   "(VGG19+LSTM) pure-torch CPU, batch 64, 64px, "
                   "preproc+infer"}, f)
    return pps


def tpu_pairs_per_sec(iters: int = 30) -> float:
    import jax

    from lctvqa import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp

    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import vqa_w

    cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                      ans_vocab_size=AVOCAB, arch_type="fixed",
                      compute_dtype="bfloat16")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)

    # params must be jit ARGUMENTS: closing over them bakes ~575MB of
    # constants into the HLO (catastrophic for remote-compile setups).
    @jax.jit
    def step(params, u8, qst):
        img = normalize_images(u8)
        return vqa_w.w_forward(params, cfg, img, qst, deterministic=True)

    # Serving throughput: batch is a free parameter of the metric
    # (pairs/sec/chip, preproc+infer). The reference train-config batch
    # (64) leaves the MXU underfed at 64px VGG19 spatial dims; the sweep
    # in scripts/bench_infer_batch.py found throughput still rising at
    # batch 1024 (38.7k vs 21.6k pairs/s; batch 2048 fails to compile on
    # the v5e). Headline = best serving batch; the reference-batch
    # number is returned alongside for continuity.
    rng = np.random.RandomState(0)
    best = {}
    for b in (BATCH, SERVE_BATCH):
        u8 = jnp.asarray(rng.randint(0, 256, (b, IMG, IMG, 3),
                                     dtype=np.uint8))
        qst = jnp.asarray(rng.randint(0, QVOCAB, (b, QLEN)).astype(
            np.int32))
        # NOTE: on the axon tunnel block_until_ready() does not actually
        # block; a scalar readback does. Executions are stream-ordered, so
        # reading the last output forces the whole queued sequence.
        float(step(params, u8, qst)[0, 0])  # compile + warmup
        n = max(iters, (iters * BATCH * 4) // b)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = step(params, u8, qst)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        best[b] = b * n / dt
    return best[SERVE_BATCH], best[BATCH], SERVE_BATCH


def int8_pairs_per_sec(iters: int = 30, batch: int | None = None) -> dict:
    """Opt-in int8 serving path (lctvqa/quant.py): throughput at the
    serving batch + argmax answer agreement vs the bf16 forward.

    Measured reality (chip A/B, scripts/bench_int8.py): int8 is ~12%
    SLOWER than bf16 at these shapes — XLA:TPU does not lower these
    s8xs8 convs to the MXU double-rate mode; int8's value is the 4x
    weight-memory cut, not throughput. BENCH_r03 recorded int8 44%
    slower because this section's int8 number was compared against a
    bf16 number from a DIFFERENT subprocess (different tunnel state) —
    so since r4 the bf16 forward is re-timed HERE, in the same process
    right before the int8 loop, and the in-situ ratio is reported
    (int8_vs_bf16_same_process). That ratio is the reconciled number;
    cross-section comparisons are not apples-to-apples on a tunneled
    chip. Reported alongside, never AS, the headline."""
    import jax
    import jax.numpy as jnp

    from lctvqa import quant
    from lctvqa.config import ModelConfig
    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import vqa_w

    batch = SERVE_BATCH if batch is None else batch
    cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                      ans_vocab_size=AVOCAB, arch_type="fixed",
                      compute_dtype="bfloat16")
    params = vqa_w.init_w_model(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_w_model(params)

    @jax.jit
    def step_int8(qp, u8, qst):
        img = normalize_images(u8)
        return quant.w_forward_int8(qp, cfg, img, qst)

    @jax.jit
    def step_ref(p, u8, qst):
        img = normalize_images(u8)
        return vqa_w.w_forward(p, cfg, img, qst, deterministic=True)

    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (batch, IMG, IMG, 3),
                                 dtype=np.uint8))
    qst = jnp.asarray(rng.randint(0, QVOCAB, (batch, QLEN)).astype(np.int32))
    agree = float(jnp.mean(jnp.argmax(step_int8(qparams, u8, qst), 1)
                           == jnp.argmax(step_ref(params, u8, qst), 1)))
    pps = {}
    for tag, fn, p in (("bf16", step_ref, params),
                       ("int8", step_int8, qparams)):
        float(fn(p, u8, qst)[0, 0])  # warm (compiled during agree above)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(p, u8, qst)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        pps[tag] = batch * iters / dt
    return {"int8_pairs_per_sec": round(pps["int8"], 2),
            "int8_batch": batch,
            "int8_answer_agreement": round(agree, 4),
            "bf16_pairs_per_sec_int8_process": round(pps["bf16"], 2),
            "int8_vs_bf16_same_process": round(pps["int8"] / pps["bf16"],
                                               4)}


def _lct_train_loop(cfg, iters: int, gen_bench: bool = True) -> dict:
    """Shared body of the train / train_derived sections: K CHAINED
    non-donating dispatches of the raw stage1+stage2 steps — step i+1
    consumes step i's params, so the single final readback is
    data-dependent on every step and bounds the whole chain, while
    dispatch enqueue pipelines under the chip step. Validation
    (scripts/bench_train_step.py, v5e): chained raw dispatch 66.3
    ms/step vs ONE-dispatch raw-pytree fori_loop 64.1 — agreement
    within 4%, so the chain measures the device program, not tunnel
    RTT."""
    import jax
    import jax.numpy as jnp

    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.train.steps import make_lct_steps

    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg.model)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(1), cfg.model)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)
    w_opt = steps["w_tx"].init(w_params)
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": jax.device_put(rng.randint(
            0, 256, (BATCH, IMG, IMG, 3), dtype=np.uint8)),
        "question": jax.device_put(rng.randint(
            0, QVOCAB, (BATCH, 25)).astype(np.int32)),
        "answer_label": jax.device_put(rng.randint(
            0, AVOCAB, (BATCH,)).astype(np.int32)),
        "answer_multi_choice": jax.device_put(rng.randint(
            -1, AVOCAB, (BATCH, 10)).astype(np.int32)),
    }
    keys = list(jax.random.split(jax.random.PRNGKey(7), iters + 1))

    def one_raw(ef_p, ef_o, w_p, w_o, r):
        r1, r2 = jax.random.split(r)
        ef_p, ef_o, _l1, _, _ = steps["stage1"](ef_p, arch, ef_o,
                                                batch, r1)
        w_p, w_o, l2, _ = steps["stage2"](w_p, w_o, ef_p, arch,
                                          batch, r2)
        return ef_p, ef_o, w_p, w_o, l2

    ef_p, ef_o = ef_params, ef_opt
    w_p, w_o = w_params, w_opt
    ef_p, ef_o, w_p, w_o, l2 = one_raw(ef_p, ef_o, w_p, w_o, keys[0])
    float(l2)                                      # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        ef_p, ef_o, w_p, w_o, l2 = one_raw(ef_p, ef_o, w_p, w_o,
                                           keys[i + 1])
    float(l2)                                      # bounds ALL iters
    dt = time.perf_counter() - t0
    out = {"pairs_per_sec": BATCH * iters / dt}

    if gen_bench:
        gen = jax.jit(lambda p, a, u8: vqa_ef.ef_generate(
            p, a, cfg.model,
            (u8.astype(jnp.float32) / 255.0 - 0.45) / 0.225,
            rng=jax.random.PRNGKey(2), deterministic=True))
        q, _ = gen(ef_p, arch, batch["image_u8"])
        int(np.asarray(jax.device_get(q))[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            q, _ = gen(ef_p, arch, batch["image_u8"])
        int(np.asarray(jax.device_get(q))[0, 0])
        dt = time.perf_counter() - t0
        out["gen_tokens_per_sec"] = BATCH * QLEN * iters / dt
    return out


def train_pairs_per_sec(iters: int = 30) -> dict:
    """Secondary metrics: full LCT training step (stage1+stage2) with the
    darts SUPERNET encoder and the 30-step generate loop, at reference
    dims."""
    from lctvqa.config import Config, ModelConfig, TrainConfig

    cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                                   ans_vocab_size=AVOCAB,
                                   arch_type="darts",
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(batch_size=BATCH))
    out = _lct_train_loop(cfg, iters)
    return {"lct_train_pairs_per_sec": round(out["pairs_per_sec"], 2),
            "generate_tokens_per_sec": round(out["gen_tokens_per_sec"], 2)}


def train_derived_pairs_per_sec(iters: int = 30) -> dict:
    """The production POST-SEARCH config (round-4 verdict #4): the
    reference's own workflow ends with retraining a derived genotype
    (`basic_vqa/pcdarts/genotypes.py` presets exist for exactly this),
    whose network has 2 chosen ops per node instead of 8 weighted ones —
    none of the supernet's mixed-op overhead. Same stage1+stage2 loop at
    reference dims, arch_type='derived', genotype=PC_DARTS_cifar."""
    from lctvqa.config import Config, ModelConfig, TrainConfig
    from lctvqa.models.genotypes import PC_DARTS_cifar

    cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                                   ans_vocab_size=AVOCAB,
                                   arch_type="derived",
                                   genotype=PC_DARTS_cifar,
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(batch_size=BATCH))
    out = _lct_train_loop(cfg, iters)
    return {"derived_train_pairs_per_sec": round(out["pairs_per_sec"], 2),
            "derived_generate_tokens_per_sec": round(
                out["gen_tokens_per_sec"], 2)}


def dispatch_pairs_per_sec(iters: int = 30) -> dict:
    """The Experiment loop's own execution shape — ONE jitted
    stage1+stage2 program over PACKED param/opt buffers with donation
    (ops/packing.py; the darts pytrees have ~1200 leaves and per-call
    dispatch grows with buffer count). Donation serializes each dispatch
    on the previous step's output handles, so on the axon tunnel this
    number includes one host<->device RTT per step — a conservative lower
    bound for remote dispatch, reported as train_pairs_per_sec_dispatch."""
    import jax

    from lctvqa.config import Config, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.ops.packing import Packer, pack_step
    from lctvqa.train.steps import make_lct_steps

    cfg = Config(model=ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                                   ans_vocab_size=AVOCAB,
                                   arch_type="darts",
                                   compute_dtype="bfloat16"),
                 train=TrainConfig(batch_size=BATCH))
    key = jax.random.PRNGKey(0)
    ef_params, arch = vqa_ef.init_ef_model(key, cfg.model)
    w_params = vqa_w.init_w_model(jax.random.PRNGKey(1), cfg.model)
    steps = make_lct_steps(cfg, unk_idx=1)
    ef_opt = steps["ef_tx"].init(ef_params)
    w_opt = steps["w_tx"].init(w_params)
    rng = np.random.RandomState(0)
    batch = {
        "image_u8": jax.device_put(rng.randint(
            0, 256, (BATCH, IMG, IMG, 3), dtype=np.uint8)),
        "question": jax.device_put(rng.randint(
            0, QVOCAB, (BATCH, 25)).astype(np.int32)),
        "answer_label": jax.device_put(rng.randint(
            0, AVOCAB, (BATCH,)).astype(np.int32)),
        "answer_multi_choice": jax.device_put(rng.randint(
            -1, AVOCAB, (BATCH, 10)).astype(np.int32)),
    }
    p_ef, p_efo = Packer(ef_params), Packer(ef_opt)
    p_w, p_wo = Packer(w_params), Packer(w_opt)

    def combined(ef_p, ef_o, w_p, w_o, arch, batch, rng):
        r1, r2 = jax.random.split(rng)
        ef_p, ef_o, loss1, _, _ = steps["stage1"](ef_p, arch, ef_o,
                                                  batch, r1)
        w_p, w_o, loss2, _ = steps["stage2"](w_p, w_o, ef_p, arch,
                                             batch, r2)
        return ef_p, ef_o, w_p, w_o, loss2

    train_step = pack_step(combined,
                           (p_ef, p_efo, p_w, p_wo, None, None, None),
                           (p_ef, p_efo, p_w, p_wo, None))
    ef_pk, ef_opk = p_ef.pack(ef_params), p_efo.pack(ef_opt)
    w_pk, w_opk = p_w.pack(w_params), p_wo.pack(w_opt)
    ef_pk, ef_opk, w_pk, w_opk, loss2 = train_step(
        ef_pk, ef_opk, w_pk, w_opk, arch, batch, key)
    float(loss2)                               # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        ef_pk, ef_opk, w_pk, w_opk, loss2 = train_step(
            ef_pk, ef_opk, w_pk, w_opk, arch, batch, key)
    float(loss2)
    dt = time.perf_counter() - t0
    return {"lct_train_pairs_per_sec_dispatch": round(BATCH * iters / dt,
                                                      2)}


def _mfu_numbers(infer_pps: float, train_pps: float | None,
                 derived_train_pps: float | None = None) -> dict:
    """Analytic-FLOPs MFU against the attached chip's bf16 peak.

    - mfu:        W-model inference (exact forward FLOPs, ops/flops.py)
    - train_mfu:  stage1 (EF fwd+bwd ~ 3x fwd) + stage2 (generate fwd +
                  3x two W forwards) per pair — an approximate lower
                  bound (BN/elementwise traffic not counted as FLOPs).
    - derived_train_mfu: same accounting with the derived-genotype EF.
    """
    import jax

    from lctvqa.config import ModelConfig
    from lctvqa.models.genotypes import PC_DARTS_cifar
    from lctvqa.ops import flops as F

    peak = F.peak_flops()
    dev = jax.devices()[0].device_kind
    w_cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                        ans_vocab_size=AVOCAB, arch_type="fixed")
    ef_cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                         ans_vocab_size=AVOCAB, arch_type="darts")
    dv_cfg = ModelConfig(img_size=IMG, qst_vocab_size=QVOCAB,
                         ans_vocab_size=AVOCAB, arch_type="derived",
                         genotype=PC_DARTS_cifar)
    infer_flops_per_pair = F.w_fwd_flops(w_cfg, 1)

    def train_flops(cfg):
        return (3.0 * F.ef_fwd_flops(cfg, 1, qlen=25)
                + F.ef_generate_flops(cfg, 1)
                + 3.0 * 2.0 * F.w_fwd_flops(w_cfg, 1))

    out = {"device": dev,
           "infer_gflops_per_pair": round(infer_flops_per_pair / 1e9, 3),
           "train_gflops_per_pair": round(train_flops(ef_cfg) / 1e9, 3),
           "derived_train_gflops_per_pair": round(
               train_flops(dv_cfg) / 1e9, 3)}
    if peak > 0:
        out["mfu"] = round(infer_pps * infer_flops_per_pair / peak, 4)
        if train_pps:
            out["train_mfu"] = round(
                train_pps * train_flops(ef_cfg) / peak, 4)
        if derived_train_pps:
            out["derived_train_mfu"] = round(
                derived_train_pps * train_flops(dv_cfg) / peak, 4)
    return out


def _tpu_reachable(timeout_s: float = 600.0) -> bool:
    """jax.devices() normally returns in seconds; when the axon tunnel is
    down it hangs FOREVER (no relay listener — observed for hours on
    2026-08-17). Probe it on a daemon thread with a bounded timeout so a
    dead tunnel yields an explicit error JSON instead of a silent hang."""
    import threading
    ok = []

    def probe():
        import jax
        ok.append(len(jax.devices()))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _run_section(name: str, extra: list) -> dict:
    """Run one bench section in a fresh subprocess (own jax client, own
    HBM arena). Sections sharing one process starve each other through
    the tunnel: after the batch-1024 inference + int8 sections, the train
    section's packed program hit RESOURCE_EXHAUSTED (2026-08-18) even
    though it fits a clean chip — deallocation of dropped section buffers
    is not prompt enough through the relay. Process exit is.

    Budget-aware (round-4 verdict #1): each attempt's timeout is derived
    from the REMAINING global budget, never a fixed 5400 s; retries stop
    the moment the budget can no longer cover another attempt. Raises
    BudgetExceeded when there is not enough wall clock left to start."""
    import subprocess
    import sys

    cmd = [sys.executable, os.path.abspath(__file__),
           "--section", name] + [str(a) for a in extra]
    last_err = None
    attempt = 0
    while True:
        rem = _remaining()
        if rem < MIN_SECTION_S:
            raise BudgetExceeded(
                f"section {name}: {rem:.0f}s budget left (< "
                f"{MIN_SECTION_S:.0f}s floor); "
                + (last_err or "not attempted"))
        timeout = max(MIN_SECTION_S, min(rem - 30.0, SECTION_CAP_S))
        attempt += 1
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout)
        except subprocess.TimeoutExpired:
            last_err = (f"section {name} attempt {attempt} timed out "
                        f"after {timeout:.0f}s")
        else:
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            last_err = (f"section {name} emitted no JSON "
                        f"(rc={proc.returncode}): "
                        f"{(proc.stderr or proc.stdout)[-400:]}")
        print(f"# {last_err}", flush=True)
        # the remote compile service flakes ("response body closed",
        # SIGKILL) — a fresh attempt against the persistent compile cache
        # usually lands (observed 2026-08-18); cap at 3 tries
        if attempt >= 3:
            raise RuntimeError(last_err)
        time.sleep(5)


def _emit(result: dict):
    """Print the current headline record NOW. Called after every section
    so an external kill still leaves the latest complete record as the
    last JSON line on stdout."""
    result = dict(result)
    result["elapsed_s"] = round(time.monotonic() - _START, 1)
    print(json.dumps(result), flush=True)


def _save_details(update: dict):
    """Merge-persist section results the moment they land."""
    d = {}
    try:
        with open(DETAILS_FILE) as f:
            d = json.load(f)
    except (OSError, ValueError):
        pass
    d.update(update)
    tmp = DETAILS_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f)
    os.replace(tmp, DETAILS_FILE)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--train_iters", type=int, default=30)
    p.add_argument("--skip_train", action="store_true",
                   help="headline inference number only (fast)")
    p.add_argument("--section", type=str, default=None,
                   choices=("infer", "int8", "train", "train_derived",
                            "dispatch"),
                   help="internal: run ONE section in this process and "
                        "print its JSON (used by the subprocess driver)")
    p.add_argument("--in_process", action="store_true",
                   help="run all sections in this process (CPU smoke)")
    args = p.parse_args()
    _apply_platform()
    if args.section:
        if os.environ.get("BENCH_FAKE_HANG_SECTION") == args.section:
            time.sleep(10 ** 9)  # test hook: budget machinery must save us
        if args.section == "infer":
            value, value_ref_batch, serve_batch = tpu_pairs_per_sec(
                args.iters)
            print(json.dumps({"value": value,
                              "value_ref_batch": value_ref_batch,
                              "serve_batch": serve_batch}))
        elif args.section == "int8":
            print(json.dumps(int8_pairs_per_sec(max(10, args.iters // 4))))
        elif args.section == "train":
            print(json.dumps(train_pairs_per_sec(args.train_iters)))
        elif args.section == "train_derived":
            print(json.dumps(train_derived_pairs_per_sec(args.train_iters)))
        elif args.section == "dispatch":
            print(json.dumps(dispatch_pairs_per_sec(args.train_iters)))
        return
    if not _tpu_reachable(min(600.0, max(30.0, _remaining() * 0.4))):
        out = {
            "metric": "vqa_pairs_per_sec_per_chip", "value": 0,
            "unit": "pairs/s", "vs_baseline": 0,
            "error": "TPU backend unreachable (axon tunnel down; "
                     "jax.devices() probe hung)"}
        # Surface the most recent completed measurement (clearly labeled
        # stale) so an outage at bench time doesn't erase measured state.
        try:
            with open(DETAILS_FILE) as f:
                d = json.load(f)
            out["last_measured_stale"] = {
                "mtime": time.strftime(
                    "%Y-%m-%d %H:%M", time.localtime(os.path.getmtime(
                        DETAILS_FILE))),
                **d,
                "vs_baseline": round(
                    d["inference_pairs_per_sec"] / _get_baseline(), 2),
            }
        except (OSError, KeyError, ValueError):
            pass
        _emit(out)
        return
    baseline = _get_baseline()

    # ---- headline: inference. Emitted the moment it lands. -------------
    try:
        if args.in_process:
            value, value_ref_batch, serve_batch = tpu_pairs_per_sec(
                args.iters)
        else:
            try:
                sec = _run_section("infer", ["--iters", args.iters])
                value, value_ref_batch, serve_batch = (
                    sec["value"], sec["value_ref_batch"],
                    sec["serve_batch"])
            except Exception as e:  # noqa: BLE001 — keep the headline
                print(f"# infer subprocess failed ({e!r}); "
                      "falling back in-process", flush=True)
                value, value_ref_batch, serve_batch = tpu_pairs_per_sec(
                    args.iters)
    except Exception as e:  # noqa: BLE001 — emit SOMETHING parseable
        out = {"metric": "vqa_pairs_per_sec_per_chip", "value": 0,
               "unit": "pairs/s", "vs_baseline": 0,
               "error": f"inference section failed: {e!r}"[:300]}
        try:
            with open(DETAILS_FILE) as f:
                d = json.load(f)
            out["last_measured_stale"] = d
        except (OSError, ValueError):
            pass
        _emit(out)
        return
    result = {
        "metric": "vqa_pairs_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "pairs/s",
        "vs_baseline": round(value / baseline, 2),
        "infer_batch": serve_batch,
        "infer_pairs_per_sec_batch64": round(value_ref_batch, 2),
    }
    result.update(_mfu_numbers(value, None))
    _emit(result)   # <-- the round can no longer be null past this line
    _save_details({"inference_pairs_per_sec": round(value, 2),
                   "inference_pairs_per_sec_batch64": round(
                       value_ref_batch, 2)})

    # ---- secondary sections, budget permitting, cheapest-signal first --
    def run_sec(name, extra, fn_in_process):
        if args.in_process:
            return fn_in_process()
        return _run_section(name, extra)

    sections = []
    if not args.skip_train:
        sections.append(
            ("train", ["--train_iters", args.train_iters],
             lambda: train_pairs_per_sec(args.train_iters)))
        sections.append(
            ("train_derived", ["--train_iters", args.train_iters],
             lambda: train_derived_pairs_per_sec(args.train_iters)))
    sections.append(
        ("int8", ["--iters", args.iters],
         lambda: int8_pairs_per_sec(max(10, args.iters // 4))))
    if not args.skip_train:
        sections.append(
            ("dispatch", ["--train_iters", args.train_iters],
             lambda: dispatch_pairs_per_sec(args.train_iters)))

    for name, extra, fn in sections:
        if _remaining() < MIN_SECTION_S:
            result[f"{name}_skipped"] = (
                f"budget exhausted ({_remaining():.0f}s left)")
            print(f"# section {name} skipped: budget exhausted", flush=True)
            continue
        try:
            sec_out = run_sec(name, extra, fn)
        except BudgetExceeded as e:
            result[f"{name}_skipped"] = str(e)[:200]
            print(f"# section {name} skipped: {e}", flush=True)
            continue
        except Exception as e:  # noqa: BLE001 — a section failure must
            # never cost the fields already measured
            result[f"{name}_error"] = str(e)[:200]
            print(f"# section {name} failed: {e!r}", flush=True)
            continue
        _save_details(sec_out)
        if name == "train":
            result["train_pairs_per_sec"] = sec_out[
                "lct_train_pairs_per_sec"]
            result["generate_tokens_per_sec"] = sec_out[
                "generate_tokens_per_sec"]
        elif name == "train_derived":
            result["derived_train_pairs_per_sec"] = sec_out[
                "derived_train_pairs_per_sec"]
        elif name == "dispatch":
            result["train_pairs_per_sec_dispatch"] = sec_out[
                "lct_train_pairs_per_sec_dispatch"]
        else:
            result.update(sec_out)
        result.update(_mfu_numbers(
            value, result.get("train_pairs_per_sec"),
            result.get("derived_train_pairs_per_sec")))
        _emit(result)   # re-print enriched after EVERY section
    _emit(result)


if __name__ == "__main__":
    main()
