"""Sanity for the analytic-FLOPs model (feeds the driver-recorded MFU)
and the zero-egress surface of the download CLI."""

import subprocess
import sys

from lctvqa.config import ModelConfig
from lctvqa.ops import flops as F


def _cfg(**kw):
    return ModelConfig(img_size=64, qst_vocab_size=8192,
                       ans_vocab_size=1000, **kw)


def test_flops_positive_and_batch_linear():
    for fn, cfg in [(F.w_fwd_flops, _cfg(arch_type="fixed")),
                    (F.ef_fwd_flops, _cfg(arch_type="darts")),
                    (F.ef_generate_flops, _cfg(arch_type="darts"))]:
        one = fn(cfg, 1)
        assert one > 0
        assert abs(fn(cfg, 64) / one - 64) < 1e-6  # exactly batch-linear


def test_w_flops_dominated_by_vgg():
    """At 64px the VGG19 trunk carries almost all of the W forward's
    FLOPs — the MFU denominator must reflect that (a regression here
    would silently skew the recorded MFU)."""
    cfg = _cfg(arch_type="fixed")
    total = F.w_fwd_flops(cfg, 1)
    vgg = F.vgg19_fwd_flops(1, cfg.img_size, cfg.vgg_width_mult,
                            cfg.vgg_fc_dim)
    assert 0.5 < vgg / total <= 1.0


def test_conv_flops_formula():
    # 2 * N * Hout * Wout * Cin/groups * Cout * Kh * Kw
    assert F.conv_flops(2, 8, 8, 4, 16, 3, 3) == 2 * 2 * 8 * 8 * 4 * 16 * 9
    assert F.conv_flops(1, 8, 8, 8, 8, 3, 3, groups=8) == \
        F.conv_flops(1, 8, 8, 1, 8, 3, 3)


def test_download_list_only_zero_egress(tmp_path):
    """--list_only prints the reference URL set without any network."""
    out = subprocess.run(
        [sys.executable, "-m", "lctvqa.data.download", "--output_dir",
         str(tmp_path), "--list_only"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    assert "val2014" in out.stdout and "train2014" in out.stdout
    assert "http" in out.stdout
    assert not list(tmp_path.iterdir())  # nothing downloaded
