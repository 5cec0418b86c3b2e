"""CPU smoke of bench.py's measurement sections at tiny dims.

bench.py is the driver's single source of the round headline; a bug in a
newly added section must fail HERE, not in the one unattended TPU run at
round end. Each section is monkeypatched to toy dimensions and executed
for numbers-are-finite / keys-present contracts (timing values are
meaningless on CPU and not asserted).
"""

import sys

import numpy as np
import pytest


@pytest.fixture()
def bench_tiny(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench
    monkeypatch.setattr(bench, "BATCH", 8)
    monkeypatch.setattr(bench, "IMG", 32)
    monkeypatch.setattr(bench, "QLEN", 8)
    monkeypatch.setattr(bench, "QVOCAB", 64)
    monkeypatch.setattr(bench, "AVOCAB", 16)
    monkeypatch.setattr(bench, "SERVE_BATCH", 16)
    return bench


def test_int8_section(bench_tiny):
    out = bench_tiny.int8_pairs_per_sec(iters=2, batch=8)
    # r4: bf16 re-timed in the SAME process so the int8-vs-bf16 ratio is
    # apples-to-apples (r3 verdict #2 — the cross-subprocess comparison
    # disagreed with the standalone A/B by 36%)
    assert set(out) == {"int8_pairs_per_sec", "int8_batch",
                        "int8_answer_agreement",
                        "bf16_pairs_per_sec_int8_process",
                        "int8_vs_bf16_same_process"}
    assert out["int8_batch"] == 8
    assert np.isfinite(out["int8_pairs_per_sec"])
    assert np.isfinite(out["bf16_pairs_per_sec_int8_process"])
    assert out["int8_vs_bf16_same_process"] > 0
    assert 0.0 <= out["int8_answer_agreement"] <= 1.0


def test_inference_section(bench_tiny):
    value, ref_batch, serve_batch = bench_tiny.tpu_pairs_per_sec(iters=2)
    assert np.isfinite(value) and np.isfinite(ref_batch)
    assert serve_batch == 16


def test_headline_survives_hung_section(tmp_path):
    """r4 verdict #1 'Done' criterion: `python bench.py` with a section
    that sleeps forever still emits a parseable headline JSON within the
    global budget. The fake hang is injected via BENCH_FAKE_HANG_SECTION;
    every knob is the real env-var machinery the driver run uses."""
    import json
    import os
    import subprocess

    env = dict(
        os.environ,
        BENCH_TINY="1",
        BENCH_PLATFORM="cpu",
        BENCH_BUDGET_S="240",
        BENCH_MIN_SECTION_S="5",
        BENCH_FAKE_HANG_SECTION="int8",
        BENCH_DETAILS_FILE=str(tmp_path / "bench_details.json"),
    )
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--iters", "2",
         "--skip_train"],
        capture_output=True, text=True, timeout=400, env=env,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.strip().startswith("{")]
    assert len(lines) >= 2, proc.stdout  # early headline + final re-print
    final = lines[-1]
    assert final["metric"] == "vqa_pairs_per_sec_per_chip"
    assert np.isfinite(final["value"]) and final["value"] > 0
    # the hung int8 section must be recorded as skipped/errored, not hang
    assert "int8_skipped" in final or "int8_error" in final, final
    # and the FIRST emitted headline already carried the value (the kill-
    # at-any-point guarantee)
    assert lines[0]["value"] == final["value"]


def test_derived_flops_positive():
    """derived_fwd_flops: positive, below the supernet's mixture count,
    consistent with ef_fwd_flops dispatch (new in r5 for the
    derived-train MFU)."""
    from lctvqa.config import ModelConfig
    from lctvqa.models.genotypes import PC_DARTS_cifar
    from lctvqa.ops import flops as F

    dv = ModelConfig(img_size=64, arch_type="derived",
                     genotype=PC_DARTS_cifar)
    da = ModelConfig(img_size=64, arch_type="darts")
    f_dv = F.derived_fwd_flops(dv, 1)
    f_da = F.darts_fwd_flops(da, 1)
    assert f_dv > 0
    # full-channel 2-op cells vs 1/4-channel 8-op mixture: same order,
    # but the supernet runs every primitive on every edge
    assert f_dv != f_da
    assert F.ef_fwd_flops(dv, 1) > f_dv  # adds LSTM + heads


def test_pipeline_bench_paths(tmp_path):
    """Both A/B paths of scripts/bench_pipeline.py run and report
    positive pairs/s on a mini synthetic set."""
    from lctvqa.data.synthetic import make_dataset

    from scripts.bench_pipeline import _bench_lctvqa, _bench_reference_style

    d = str(tmp_path / "pipe")
    make_dataset(d, num_images=8, num_questions=64, img_size=16,
                 n_answers=16)
    ours = _bench_lctvqa(d, batch_size=8, epochs=1, use_native=False)
    ref = _bench_reference_style(d, batch_size=8, epochs=1)
    assert ours > 0 and ref > 0
